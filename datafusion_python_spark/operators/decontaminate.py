"""Benchmark decontamination: remove training docs that overlap an
evaluation set on word n-grams.

The standard LLM-corpus hygiene step (n-gram collision against held-out
benchmarks). Scale shape: the eval set is tiny (thousands of docs)
next to the corpus (100 TB), so the corpus side NEVER shuffles —
eval n-grams are distinct-ed, broadcast, and the corpus explodes its
n-grams map-side into a broadcast hash join, then aggregates per doc.
The final filter is a broadcast left-anti join of the corpus against
the (small) contaminated-id set.

Reference parity: none — apache/datafusion-python has no corpus ops;
this extends the suite for the training-data workloads the engine
targets (same family as operators/dedup.py, operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _norm_text


def _ngram_strings(words, n: int):
    """Word n-grams of a MATERIALIZED words array, as strings.

    Empty when the doc has fewer than ``n`` words (standard
    decontamination semantics — a too-short doc has no n-gram to
    collide). Space-joined strings (not hashes) so the result is
    engine-agnostic; hashing is applied separately where wanted.
    """
    size = F.size(words)
    idx = F.sequence(F.lit(1), size - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_inventory(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    hash_grams: bool = True,
) -> DataFrame:
    """Explode ``df`` into one row per (id, distinct n-gram).

    ``hash_grams`` replaces the gram string with ``xxhash64(gram)``
    before the explode — at scale that turns a wide string shuffle into
    8-byte keys (collision odds ~n²/2⁶⁴, negligible against corpus
    noise). Map-only: normalize → split → gram → explode, no shuffle.
    """
    words = F.filter(F.split(_norm_text(F.col(text_col)), " "), lambda w: w != "")
    staged = df.select(F.col(id_col), words.alias("_words"))
    grams = _ngram_strings(F.col("_words"), n)
    if hash_grams:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    return (
        staged.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("ngram"))
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlap: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-corpus-doc count of distinct n-grams shared with ANY eval doc.

    Returns ``(id_col, n_collisions)`` for docs at or above
    ``min_overlap``. The eval inventory is distinct-ed then broadcast —
    the corpus side stays map-local through normalize/explode/join and
    only the per-doc counts (bounded by corpus doc count, not gram
    count) reach a shuffle.
    """
    corpus_grams = ngram_inventory(corpus, text_col, id_col, n, hash_grams)
    eval_grams = (
        ngram_inventory(eval_df, text_col, id_col, n, hash_grams)
        .select("ngram")
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_collisions"))
        .filter(F.col("n_collisions") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlap: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Corpus with contaminated docs removed (broadcast anti-join).

    The contaminated-id set is at most the eval set's n-gram
    neighborhood — small — so the anti-join broadcasts and the corpus
    passes through without shuffling.
    """
    bad = contamination_report(
        corpus, eval_df, text_col, id_col, n, min_overlap, hash_grams
    ).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
