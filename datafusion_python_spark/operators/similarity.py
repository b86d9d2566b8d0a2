"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (a single scan +
TakeOrderedAndProject — no shuffle of the corpus); the LSH-bucketed
variants are the scale path: random-hyperplane signatures bucket the
corpus so a query or self-join only touches its bucket. Dot products
run through zip_with/aggregate — JVM codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (splitmix64-style mix).

    Derived from (plane, dim) constants so every executor — and every
    rerun — regenerates identical planes with no broadcast state.
    """
    out = []
    for p in range(1, n_planes + 1):
        vals = []
        for d in range(dim):
            x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 31
            x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 29
            vals.append(((x & 0xFFFF) / 65535.0) * 2.0 - 1.0)
        out.append(vals)
    return out


def _signature(emb: Column, planes: list[list[float]]) -> Column:
    out = F.lit(0)
    for i, pl in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in pl])
        out = out.bitwiseOR(F.when(_dot(emb, arr) >= 0, 1 << i).otherwise(0))
    return out


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest neighbors to ``query_vec`` by cosine.

    One pass over the corpus; sort+limit fuses to TakeOrderedAndProject,
    so per-partition heaps keep only k rows — works unchanged at 100 TB.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_similarity_col(emb, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def lsh_signature(
    df: DataFrame, dim: int, vec_col: str = "embedding", n_planes: int = 6
) -> DataFrame:
    """Append the random-hyperplane ``bucket`` signature column.

    At ingest scale this column becomes the bucketing/partition key, so
    later ANN probes and near-dup joins are partition-local.
    """
    emb = F.col(vec_col).cast("array<double>")
    return df.withColumn("bucket", _signature(emb, _planes(dim, n_planes)))


def lsh_bucket_ann(
    df: DataFrame,
    query_vec: list[float],
    n_planes: int = 6,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact rerank.

    Candidate set shrinks ~2^n_planes-fold vs brute force; recall can be
    raised with multi-probe (also scan buckets at Hamming distance 1 —
    pass the same query with flipped signature bits).
    """
    planes = _planes(len(query_vec), n_planes)
    qs = 0
    for i, pl in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, pl)) >= 0:
            qs |= 1 << i
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    emb = F.col(vec_col).cast("array<double>")
    return (
        df.withColumn("bucket", _signature(emb, planes))
        .filter(F.col("bucket") == F.lit(qs))
        .select(F.col(id_col), F.round(cosine_similarity_col(emb, q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs with cosine ≥ threshold.

    Default path buckets by hyperplane signature and compares within a
    bucket (join keyed on ``bucket`` — linear-ish shuffle); high-cosine
    pairs land in the same bucket with probability (1−θ/π)^n_planes.
    ``exact=True`` runs the full O(n²) self-join — for oracle validation
    at test scale, never at 100 TB.
    """
    emb = F.col(vec_col).cast("array<double>")
    if exact:
        a = df.select(F.col(id_col).alias("id_a"), emb.alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), emb.alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        sig = lsh_signature(df, dim=dim, vec_col=vec_col, n_planes=n_planes)
        a = sig.select(F.col(id_col).alias("id_a"), "bucket", emb.alias("va"))
        b = sig.select(F.col(id_col).alias("id_b"), "bucket", emb.alias("vb"))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
