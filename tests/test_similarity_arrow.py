"""Arrow-kernel twins of the similarity operators must be bit-identical
to the declarative JVM paths — same rows, same rounding, same
tie-breaks — since they swap only the per-partition kernel, never the
reduce shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_python_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_arrow,
    cosine_topk,
    cosine_topk_arrow,
    ivf_assign,
    ivf_assign_arrow,
    ivf_centroids,
)
from datafusion_python_spark.tables import load_table

QUERY = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_cosine_topk_arrow_matches_jvm(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    jvm = [(r.vec_id, r.cosine) for r in cosine_topk(emb, QUERY, k=15).collect()]
    arrow = [(r.vec_id, r.cosine) for r in cosine_topk_arrow(emb, QUERY, k=15).collect()]
    assert arrow == jvm
    assert len(arrow) == 15


def test_cosine_topk_arrow_many_partitions(spark, sf_dir):
    # local top-k per batch + global TakeOrdered must agree with the
    # single-partition answer regardless of the split
    emb = _emb(spark, sf_dir)
    one = [(r.vec_id, r.cosine) for r in cosine_topk_arrow(emb.coalesce(1), QUERY, k=5).collect()]
    many = [(r.vec_id, r.cosine) for r in cosine_topk_arrow(emb.repartition(16), QUERY, k=5).collect()]
    assert one == many


def test_ivf_assign_arrow_matches_jvm(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, n_list=8)
    jvm = {r.vec_id: r.ivf_cell for r in ivf_assign(emb, cents).collect()}
    arrow = {r.vec_id: r.ivf_cell for r in ivf_assign_arrow(emb, cents).collect()}
    assert arrow == jvm


def test_near_dup_pairs_arrow_matches_jvm(spark, sf_dir):
    base = _emb(spark, sf_dir)
    # plant exact duplicates so both paths must emit cosine-1.0 pairs
    dupes = base.limit(5).withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    emb = base.union(dupes)
    jvm = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs(emb, dim=64, threshold=0.5).collect()
    )
    arrow = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_near_dup_pairs_arrow(emb, dim=64, threshold=0.5).collect()
    )
    assert arrow == jvm
    assert len(arrow) >= 5


def test_random_projection_arrow_matches_jvm(spark, sf_dir):
    from datafusion_python_spark.operators.projection import (
        random_projection,
        random_projection_arrow,
    )

    emb = _emb(spark, sf_dir)
    jvm = {r.vec_id: r.proj for r in random_projection(emb, out_dim=8).collect()}
    arrow = {r.vec_id: r.proj for r in random_projection_arrow(emb, out_dim=8).collect()}
    assert arrow == jvm
    assert all(len(v) == 8 for v in arrow.values())


def test_ivf_assign_arrow_keeps_columns(spark, sf_dir):
    emb = _emb(spark, sf_dir).withColumn("tag", F.lit("x"))
    out = ivf_assign_arrow(emb, [[1.0] * 64, [-1.0] * 64])
    assert out.columns == ["vec_id", "embedding", "tag", "ivf_cell"]
    n_cells = out.select("ivf_cell").distinct().count()
    assert 1 <= n_cells <= 2
