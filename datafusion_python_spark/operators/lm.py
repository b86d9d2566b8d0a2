"""N-gram language-model perplexity scoring — the CCNet/KenLM-shaped
quality filter: documents whose token sequences are improbable under a
reference-corpus LM are boilerplate/gibberish candidates.

A real deployment trains KenLM offline; the *engine* work — and what
this module provides — is (a) distributed n-gram count training as
ordinary aggregations and (b) scoring as one explode + broadcast join +
per-doc aggregate:

- counts are vocabulary²-bounded (tiny next to the corpus) → broadcast;
- the corpus pays one explode and one per-doc aggregation — no
  all-to-all; at 100 TB the scoring pass is scan-dominated;
- add-k smoothing keeps unseen bigrams finite and the arithmetic
  engine-portable (the oracle replays it exactly in DuckDB).

score(doc) = exp(−mean_i ln P(w_i | w_{i−1})),
P(w|p) = (c(p,w) + k) / (c(p) + k·V)  — lower is more natural text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .text import _words


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, prev_word, word) bigram occurrence (in order)."""
    staged = df.withColumn("__lm_words", _words(F.col(text_col)))
    w = F.col("__lm_words")
    n = F.size(w)
    m = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(w, 1, m),
        F.slice(w, 2, m),
        lambda a, b: F.struct(a.alias("prev"), b.alias("word")),
    )
    return staged.select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.word").alias("word"))


def train_bigram_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(prev, word, c2, c1, v): bigram count, prefix count, vocab size.

    Two aggregations over the exploded bigrams (map-side combine on
    both); output is vocabulary-sized — persist it as the model.
    """
    bg = _bigrams(df, id_col, text_col)
    c2 = bg.groupBy("prev", "word").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = c2.select(F.countDistinct("word").alias("v"))
    # c1/v are vocabulary-sized — broadcast so assembling the model never
    # sort-merges (static plans lack stats for derived aggregates; at
    # runtime AQE would fix it, but the hint makes it unconditional)
    return c2.join(broadcast(c1), "prev").join(broadcast(v))


def perplexity(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 0.5,
    out_col: str = "ppl",
) -> DataFrame:
    """Per-document perplexity under the bigram model (docs with <2
    tokens are excluded — no bigrams to score).

    Unseen bigrams/prefixes back off to the smoothed floor
    ``k / (0 + k·V)``. The model side broadcasts; the corpus pays one
    explode + one per-doc aggregation.
    """
    bg = _bigrams(df, id_col, text_col)
    # separate joins: an unseen bigram whose PREFIX is seen must still
    # normalize by that prefix's count, so c2 and c1 look up independently
    m2 = broadcast(model.select("prev", "word", "c2").distinct())
    m1 = broadcast(model.select("prev", "c1").distinct())
    vocab = broadcast(model.groupBy().agg(F.first("v").alias("v_all")))
    scored = (
        bg.join(m2, ["prev", "word"], "left")
        .join(m1, "prev", "left")
        .join(vocab)
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + k)
                / (F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("v_all"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.exp(-F.avg("logp")).alias(out_col), F.count("*").alias("n_bigrams"))
    )
