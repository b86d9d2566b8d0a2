"""Embedding quantization: per-vector symmetric int8 (scalar
quantization), the standard 4× memory/IO shrink for ANN indexes at
corpus scale.

q[i] = clip(floor(x[i]/scale + 0.5), -127, 127),  scale = max|x|/127

``floor(x+0.5)`` is written out explicitly (not ``round``) so the
tie-breaking rule is engine-independent — the oracle recomputes the
identical arithmetic in DuckDB. Pure map-side array math (HOF
transform), no shuffle; a 100 TB embedding store quantizes at scan
speed and the int8 arrays cut shuffle/broadcast bytes 4× in any
downstream join. Dequantized cosine stays within ~0.4% of exact
(pinned by property test), which is why IVF/LSH reranks can run on
int8 and only fetch fp32 for the final top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    q_col: str = "q_emb",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Append int8-valued ``q_col`` (as array<int>) and double ``scale_col``.

    All-zero vectors get scale 0 and an all-zero code (dequantizes to
    the zero vector, cosine undefined there exactly as for the input).
    """
    staged = df.withColumn("__mx", _absmax(F.col(emb_col)))
    scale = F.when(F.col("__mx") > 0, F.col("__mx") / 127.0).otherwise(F.lit(0.0))
    staged = staged.withColumn(scale_col, scale)
    code = F.when(
        F.col(scale_col) > 0,
        F.transform(
            F.col(emb_col),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / F.col(scale_col) + 0.5).cast("int"),
                ),
            ),
        ),
    ).otherwise(F.transform(F.col(emb_col), lambda x: F.lit(0)))
    return staged.withColumn(q_col, code).drop("__mx")


def dequantize(
    df: DataFrame,
    q_col: str = "q_emb",
    scale_col: str = "q_scale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Reconstruct float vectors: x̂[i] = q[i] * scale."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)),
    )


def reconstruction_rmse(
    df: DataFrame,
    emb_col: str = "embedding",
    q_col: str = "q_emb",
    scale_col: str = "q_scale",
    out_col: str = "recon_rmse",
) -> DataFrame:
    """Per-vector RMSE between original and dequantized — the
    quantization-quality audit column (bounded by scale/2 per element)."""
    dq = F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col))
    se = F.zip_with(
        F.col(emb_col), dq, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    n = F.size(F.col(emb_col))
    return df.withColumn(
        out_col,
        F.when(n > 0, F.sqrt(F.aggregate(se, F.lit(0.0), lambda a, v: a + v) / n)),
    )
