"""Listing-table partitioning + plan introspection, driven on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_python_spark.plans import (
    explain_str,
    physical_join_strategies,
    pushed_filters,
    sql_metrics,
)
from datafusion_python_spark.sources import (
    partitioned_write,
    read_listing_table,
    read_partitioned,
)
from datafusion_python_spark.tables import load_table


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    partitioned_write(orders, path, ["o_year"])
    back = read_listing_table(spark, path)
    assert back.count() == orders.count()
    assert "o_year" in back.columns  # discovered partition column

    pruned = read_partitioned(spark, path, "o_year = 1996")
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan and "1996" in plan
    assert pruned.count() == orders.filter("o_year = 1996").count()


def test_pushed_filters_and_join_strategy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10)
    pf = pushed_filters(li)
    assert pf and any("l_quantity" in p for p in pf)

    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    j = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    assert "BroadcastHashJoin" in physical_join_strategies(j)


def test_sql_metrics_after_action(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count()
    df.collect()
    m = sql_metrics(df)
    assert m, "no metrics collected"
    total_out = sum(v.get("numOutputRows", 0) for v in m.values())
    assert total_out > 0
    assert any(k.startswith("Scan parquet") for k in m)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    from datafusion_python_spark.plans import explain_str
    from datafusion_python_spark.sources.bucketed import (
        bucketed_join_ready,
        read_bucketed,
        write_bucketed,
    )
    from datafusion_python_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
    )
    assert bucketed_join_ready(spark, "b_orders", "b_lineitem")
    bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
    # merge hint: at sf0.001 both sides fit the broadcast threshold, which
    # would sidestep the bucketed path this test exists to pin (at real
    # scale neither fact table broadcasts and SMJ is what the planner picks)
    joined = bo.hint("merge").join(bl, "o_orderkey").groupBy("o_orderstatus").count()
    plan = explain_str(joined)
    # the join itself must read co-located buckets: no shuffle before it
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    n = joined.count()
    assert n > 0


def test_in_memory_dataset_filter_pushdown(spark, tmp_path):
    """Filters on an in-memory pyarrow dataset must reach the dataset
    scanner (ref dataset_exec.rs:80-108): the scanner's output row count
    drops to the filtered size, and the pushed-filter log shows the
    translated predicates (not rejections)."""
    import json

    import pyarrow as pa
    import pyarrow.dataset as pads

    from datafusion_python_spark.sources.arrow_dataset import read_dataset

    tbl = pa.table({"x": list(range(1000)), "s": [f"row{i}" for i in range(1000)]})
    stats = str(tmp_path / "scan_stats.jsonl")
    df = read_dataset(spark, pads.dataset(tbl), stats_path=stats)
    got = df.filter("x > 990 AND s LIKE 'row99%'").collect()
    assert sorted(r.x for r in got) == list(range(991, 1000))

    events = [json.loads(ln) for ln in open(stats)]
    pushed = next(e for e in events if e["event"] == "pushFilters")
    assert any("GreaterThan" in f for f in pushed["pushed"])
    assert any("StringStartsWith" in f for f in pushed["pushed"])
    read_ev = next(e for e in events if e["event"] == "read")
    assert read_ev["scanned_rows"] == 9  # scanner, not Spark, dropped the rest


def test_register_dataset_in_memory_still_green(spark):
    import pyarrow as pa
    import pyarrow.dataset as pads

    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    ctx.register_dataset("mem_ds", pads.dataset(tbl))
    out = ctx.sql("SELECT v FROM mem_ds WHERE k >= 2 ORDER BY k").to_pydict()
    assert out["v"] == ["b", "c"]


def test_bucketed_qualified_overwrite_keeps_default_db(spark):
    """Overwriting db.table must not touch the default database's
    same-named table directory (the cleanup resolves the real catalog
    location, not warehouse/<last name component>)."""
    from datafusion_python_spark.sources.bucketed import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    try:
        write_bucketed(df, "btbl", ["k"], num_buckets=4)
        write_bucketed(df, "bdb.btbl", ["k"], num_buckets=4)
        # second overwrite of the qualified name: pre-fix this rmtree'd
        # the DEFAULT db's btbl directory and left bdb's orphan behind
        write_bucketed(df.filter("k < 50"), "bdb.btbl", ["k"], num_buckets=4)
        assert spark.table("btbl").count() == 100
        assert spark.table("bdb.btbl").count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS btbl")
        spark.sql("DROP TABLE IF EXISTS bdb.btbl")
        spark.sql("DROP DATABASE IF EXISTS bdb")


def test_compact_files(spark, tmp_path):
    import glob

    from datafusion_python_spark.sources.bucketed import compact_files

    path = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(0, 10000).repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 40
    n = compact_files(spark, path, target_file_mb=128)
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    assert spark.read.parquet(path).count() == 10000
