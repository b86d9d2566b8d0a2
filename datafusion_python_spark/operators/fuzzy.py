"""Fuzzy (edit-distance) string matching via q-gram blocking.

All-pairs ``levenshtein(a, b) <= d`` is O(n²) — unusable on a large
entity table. The q-gram filter makes it near-linear: an edit operation
destroys at most ``q`` q-grams, so strings within distance ``d`` share
at least ``(min_len − q + 1) − d·q`` grams; whenever that bound is ≥ 1
(strings of length ``min_len > (d+1)·q − 1``), *blocking on shared
q-grams loses no true pair*. Candidates = pairs sharing ≥1 gram (one
shuffle keyed by gram), then the exact ``levenshtein`` verifies — the
same block-then-verify topology as the MinHash/LSH dedup path.

Skew note: ultra-common grams (stop-grams) inflate one bucket's
candidate count quadratically; at scale drop the top-k most frequent
grams (still lossless while the count bound stays ≥ 1 after removing
k) or salt the bucket join (`operators.skew`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgrams(col: Column | str, q: int = 2) -> Column:
    """Distinct character q-grams of a string column (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, q)))


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """(id_a, id_b, dist): all pairs with edit distance ≤ ``max_distance``
    among rows sharing ≥1 q-gram (lossless when strings are longer than
    ``(max_distance+1)·q − 1`` characters — see module docstring).
    """
    grams = (
        df.select(id_col, str_col)
        .withColumn("__grams", qgrams(str_col, q))
        .select(id_col, str_col, F.explode("__grams").alias("gram"))
    )
    a = grams.select(
        F.col(id_col).alias("id_a"), F.col(str_col).alias("s_a"), "gram"
    )
    b = grams.select(
        F.col(id_col).alias("id_b"), F.col(str_col).alias("s_b"), "gram"
    )
    cand = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """Two-table fuzzy equi-join: rows whose strings are within
    ``max_distance`` edits, found through the shared-q-gram block.
    Returns all left columns + all right columns + ``dist``.
    """
    lg = left.withColumn("__grams", qgrams(left_col, q)).select(
        "*", F.explode("__grams").alias("__gram")
    ).drop("__grams")
    rg = right.withColumn("__grams", qgrams(right_col, q)).select(
        "*", F.explode("__grams").alias("__gram")
    ).drop("__grams")
    cand = lg.join(rg, "__gram").drop("__gram").distinct()
    return cand.withColumn(
        "dist", F.levenshtein(left_col, right_col)
    ).filter(F.col("dist") <= max_distance)
