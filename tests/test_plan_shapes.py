"""Plan-shape audit: the scale invariants behind SURVEY §4.

Not timing tests — structural assertions on the physical plan: filters
reach the parquet scan, dimension joins broadcast (no shuffle of the
fact side against small dims), sort+limit fuses to
TakeOrderedAndProject, and no Python UDFs appear in any suite query.
"""

from __future__ import annotations

import pytest

from datafusion_python_spark.plans import (
    explain_str,
    physical_join_strategies,
    pushed_filters,
)
from datafusion_python_spark.suite import ALL_QUERIES
from datafusion_python_spark.suite_tpch import q1, q3, q5, q6, q9


def test_q6_filters_pushed(spark, sf_dir):
    df = q6(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf


def test_dim_joins_broadcast(spark, sf_dir):
    for q in (q3, q5, q9):
        strategies = set(physical_join_strategies(q(spark, sf_dir)))
        assert "BroadcastHashJoin" in strategies, q.__name__
        # no cartesian products anywhere
        assert "CartesianProduct" not in strategies, q.__name__


def test_q2_q11_plan_shapes(spark, sf_dir):
    from datafusion_python_spark.suite_tpch import q2, q11

    s2 = physical_join_strategies(q2(spark, sf_dir))
    assert "BroadcastHashJoin" in set(s2)
    assert "CartesianProduct" not in set(s2)
    # q11's only nested-loop is the broadcast of the 1-row grand total
    s11 = physical_join_strategies(q11(spark, sf_dir))
    assert "CartesianProduct" not in set(s11)
    # q11 lazily localCheckpoints the aggregated rows (scale fix for the
    # scalar threshold), which hides the scan subtree from the returned
    # plan — assert the filter pushdown on the pre-checkpoint stage,
    # which is the plan that actually reads parquet
    from pyspark.sql import functions as F

    from datafusion_python_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    n_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    value = (
        li.join(F.broadcast(n_supp), li.l_suppkey == n_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value_raw"))
    )
    pf = " ".join(pushed_filters(value))
    assert "NATION_7" in pf  # nation filter reaches the scan


def test_topk_fuses(spark, sf_dir):
    plan = explain_str(q3(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_no_python_udf_in_suite(spark, sf_dir):
    # the entire correctness suite must stay JVM-side (SURVEY §4.2);
    # BatchEvalPython / ArrowEvalPython in a plan means a Python UDF crept in
    offenders = []
    for name, (fn, _sql) in sorted(ALL_QUERIES.items()):
        plan = explain_str(fn(spark, sf_dir))
        if "EvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_wholestage_codegen_on_q1(spark, sf_dir):
    plan = explain_str(q1(spark, sf_dir), mode="codegen")
    assert "WholeStageCodegen" in plan


def test_q1_partial_aggregation_and_pruning(spark, sf_dir):
    plan = explain_str(q1(spark, sf_dir))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # column pruning: unreferenced lineitem columns absent from ReadSchema
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    # the corpus must flow map-only into a broadcast join (no corpus
    # shuffle); only per-doc counts may shuffle, with map-side combine
    from datafusion_python_spark.suite_pipeline import pipe_decontaminate

    plan = explain_str(pipe_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_stratified_sample_is_map_only(spark, sf_dir):
    from datafusion_python_spark.operators.sampling import stratified_sample
    from datafusion_python_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = explain_str(stratified_sample(docs, "source", {"src0": 0.5}, "doc_id"))
    assert "Exchange" not in plan  # pure filter: no shuffle anywhere


def test_chunking_is_map_only(spark, sf_dir):
    from datafusion_python_spark.operators.chunking import chunk_documents
    from datafusion_python_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = explain_str(chunk_documents(docs, "doc_id", "text", chunk_tokens=40))
    assert "Exchange" not in plan  # array math + generate: no shuffle
    assert "Generate" in plan


def test_bm25_broadcasts_statistics(spark, sf_dir):
    # corpus side: one shuffle on (doc, term); df/N/avgdl sides broadcast —
    # never a sort-merge join of the corpus against vocabulary statistics
    from datafusion_python_spark.suite_pipeline import pipe_bm25

    plan = explain_str(pipe_bm25(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shuffle_order_uses_range_partitioning(spark, sf_dir):
    # global md5 sort must be a range-partitioned sort (scales out),
    # never a single-partition sort
    from datafusion_python_spark.operators.sampling import deterministic_shuffle
    from datafusion_python_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = explain_str(deterministic_shuffle(docs, "doc_id", "s"))
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_random_projection_is_map_only(spark, sf_dir):
    from datafusion_python_spark.operators.projection import random_projection
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = explain_str(random_projection(emb, "embedding", out_dim=4))
    assert "Exchange" not in plan


def test_hll_partial_aggregates_map_side(spark, sf_dir):
    # sketches must build map-side (partial_hll_sketch_agg) so only
    # register arrays cross the one shuffle
    from datafusion_python_spark.operators.sketches import hll_partial
    from datafusion_python_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain_str(hll_partial(ev, ["event_type"], "user_id"))
    assert "partial_hll_sketch_agg" in plan
