"""Model-scoring plumbing for corpus quality filtering: a hashed
bag-of-words linear classifier (the fastText / CCNet quality-filter
shape) evaluated entirely JVM-side.

score(doc) = sigmoid(bias + Σ_w weights[h(w) mod dim] / n_words)

The weights vector rides the plan as a literal array (fine to ~10⁵
dims; beyond that, broadcast a (bucket, weight) DataFrame and join).
Scoring is a pure map: normalize → split → per-word weight lookup via
``element_at`` → in-order fold — no shuffle, no Python, so a 100 TB
corpus scores at scan speed and the filter composes with pushdown.

Real model weights come from offline training (out of scope here);
the operator takes any ``list[float]``. Hashers: ``xxhash64`` (fast
JVM path, default) or ``md5`` (engine-portable — same indices in
DuckDB/Trino, used by the oracle-paired gate).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _norm_text


def _bucket(word: Column, dim: int, hasher: str) -> Column:
    if hasher == "xxhash64":
        return F.pmod(F.xxhash64(word), F.lit(dim))
    if hasher == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("bigint"), F.lit(dim)
        )
    raise ValueError("hasher must be 'xxhash64' or 'md5'")


def score_linear(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "score",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Append ``out_col``: the sigmoid-calibrated linear score per doc.

    Empty docs score ``sigmoid(bias)``. The fold runs in word order on
    both engines, so scores are bit-reproducible for a fixed hasher.
    """
    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty")
    warr = F.array(*[F.lit(float(w)) for w in weights])
    words = F.filter(F.split(_norm_text(F.col(text_col)), " "), lambda w: w != "")
    staged = df.withColumn("__words", words).withColumn("__warr", warr)
    acc = F.aggregate(
        F.col("__words"),
        F.lit(0.0),
        lambda a, w: a
        + F.element_at(F.col("__warr"), (_bucket(w, dim, hasher) + 1).cast("int")),
    )
    n = F.size(F.col("__words"))
    raw = F.lit(float(bias)) + F.when(n > 0, acc / n).otherwise(F.lit(0.0))
    return (
        staged.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)))
        .drop("__words", "__warr")
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.5,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Keep docs scoring at or above ``threshold`` (score column kept)."""
    return score_linear(df, text_col, weights, bias, hasher=hasher).filter(
        F.col("score") >= threshold
    )


def demo_weights(dim: int = 64, seed: int = 7) -> list[float]:
    """Deterministic stand-in weights (LCG over buckets), range [-0.5, 0.5].

    Lets gates/tests pin exact scores without shipping a trained model;
    reproducible in plain SQL: w[i] = ((seed + i*2654435761) mod 1000)/1000 - 0.5.
    """
    return [
        ((seed + i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(dim)
    ]


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
