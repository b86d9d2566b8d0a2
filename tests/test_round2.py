"""Round-2 surface tests: parquet writer options, record-batch streams,
url tables, object stores, UDAF-in-aggregate, and the advisor-flagged
function fixes (ordered aggs with desc non-numeric keys, like escape,
fill_nan, date_bin floor, range negative step, gcd worst case)."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_python_spark.api.context import SessionContext
from datafusion_python_spark.api.dataframe import (
    DataFrame,
    ParquetColumnOptions,
    ParquetWriterOptions,
)
from datafusion_python_spark.api import functions as dpf
from datafusion_python_spark.api.expr import Expr, col, lit


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


@pytest.fixture(scope="module")
def spark(ctx):
    return ctx.spark


def test_parquet_column_options_bloom_filter(ctx, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pq") / "bloom")
    # k must be high-cardinality: parquet-mr silently skips bloom filters
    # for fully dictionary-encoded columns (the dictionary is exact)
    df = DataFrame(spark.range(1000).coalesce(1).select(
        F.col("id"),
        (F.col("id") * 7919).alias("k"),
        (F.col("id") % 7).cast("string").alias("s"),
    ))
    opts = ParquetWriterOptions(
        compression="zstd(3)",
        column_specific_options={
            "k": ParquetColumnOptions(
                bloom_filter_enabled=True,
                bloom_filter_ndv=1000,
                dictionary_enabled=False,
            ),
            "s": ParquetColumnOptions(dictionary_enabled=False),
        },
    )
    df.write_parquet_with_options(out, opts)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    meta = pq.ParquetFile(os.path.join(out, files[0])).metadata
    rg = meta.row_group(0)
    by_name = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
    # dictionary encoding disabled for s even though it is low-cardinality
    # (7 distinct strings would otherwise always dictionary-encode)
    assert not by_name["s"].has_dictionary_page
    # bloom filter: neither pyarrow nor duckdb here expose the bloom
    # offset, so assert physically — the bloom-filtered file must carry
    # extra bytes vs an identical write without the filter
    out2 = out + "_nobloom"
    df.write_parquet_with_options(
        out2,
        ParquetWriterOptions(
            compression="zstd(3)",
            column_specific_options={
                "k": ParquetColumnOptions(dictionary_enabled=False),
                "s": ParquetColumnOptions(dictionary_enabled=False),
            },
        ),
    )
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    assert size(out) > size(out2)


def test_parquet_column_options_full_surface(spark, tmp_path):
    # per-column encoding/compression/statistics now write through the
    # distributed pyarrow writer path
    import pyarrow.parquet as pq

    from datafusion_python_spark.api.dataframe import ParquetWriterOptions

    df = DataFrame(spark.createDataFrame([(1, "x"), (2, "y")], "a bigint, b string"))
    out = str(tmp_path / "colopts")
    df.write_parquet_with_options(
        out,
        ParquetWriterOptions(
            compression="zstd(3)",
            created_by="colopts-test",
            column_specific_options={
                "a": ParquetColumnOptions(
                    encoding="delta_binary_packed",
                    dictionary_enabled=False,
                    statistics_enabled="none",
                ),
                "b": ParquetColumnOptions(compression="snappy"),
            },
        ),
    )
    files = list(__import__("pathlib").Path(out).rglob("*.parquet"))
    assert files
    md = pq.ParquetFile(files[0]).metadata
    assert md.created_by == "colopts-test"
    cols = {
        md.row_group(0).column(i).path_in_schema: md.row_group(0).column(i)
        for i in range(md.row_group(0).num_columns)
    }
    assert "DELTA_BINARY_PACKED" in cols["a"].encodings
    assert cols["a"].statistics is None and cols["b"].statistics is not None
    assert cols["b"].compression.lower() == "snappy"
    assert cols["a"].compression.lower() == "zstd"


def test_execute_stream_and_partitioned(spark):
    df = DataFrame(spark.range(0, 1000, 1, 4).select(F.col("id")))
    stream = df.execute_stream(rows_per_batch=128)
    total = sum(b.to_pyarrow().num_rows for b in stream)
    assert total == 1000
    streams = df.execute_stream_partitioned()
    assert len(streams) == 4
    assert sum(b.to_pyarrow().num_rows for s in streams for b in s) == 1000


def test_record_batch_stream_async(spark):
    import asyncio

    df = DataFrame(spark.range(100))
    stream = df.execute_stream(rows_per_batch=30)

    async def drain():
        n = 0
        async for batch in stream:
            n += batch.to_pyarrow().num_rows
        return n

    assert asyncio.run(drain()) == 100


def test_transform_chain(spark):
    df = DataFrame(spark.range(10))

    def add_double(d, factor):
        return DataFrame(d.df.withColumn("twice", F.col("id") * factor))

    out = df.transform(add_double, 2)
    assert out.df.filter(F.col("twice") == 18).count() == 1


def test_enable_url_table(ctx, spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("url") / "t.parquet")
    spark.range(5).write.mode("overwrite").parquet(p)
    url_ctx = ctx.enable_url_table()
    assert url_ctx.sql(f"SELECT count(*) AS n FROM '{p}'").df.first()["n"] == 5
    # base context unchanged
    with pytest.raises(Exception):
        ctx.sql(f"SELECT count(*) AS n FROM '{p}'").df.first()


def test_register_object_store(ctx, spark):
    from datafusion_python_spark.sources.object_store import AmazonS3, Http

    store = AmazonS3(
        bucket_name="examplebucket",
        region="eu-central-1",
        access_key_id="AKEXAMPLE",
        secret_access_key="secret",
    )
    ctx.register_object_store("s3://", store)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.bucket.examplebucket.access.key") == "AKEXAMPLE"
    assert hconf.get("fs.s3a.bucket.examplebucket.endpoint.region") == "eu-central-1"
    # Http registration is a no-op (reads localize driver-side on demand)
    ctx.register_object_store("http://", Http("http://example.com"))


def test_udfs_listing(ctx):
    from datafusion_python_spark.api.udf import udf
    import pyarrow as pa

    my = udf(lambda a: pa.compute.add(a, 1), [pa.int64()], pa.int64(), "immutable", name="plus_one_r2")
    ctx.register_udf(my)
    assert "plus_one_r2" in ctx.udfs()


def test_udaf_in_aggregate_global(spark):
    from datafusion_python_spark.api.udf import udaf
    from datafusion_python_spark.suite_udf import GeoMean

    df = DataFrame(spark.createDataFrame([(2.0,), (8.0,)], ["x"]))
    gm = udaf(GeoMean, ["double"], "double", name="geomean")
    out = df.aggregate([], [gm(col("x")).alias("g")])
    row = out.df.first()
    assert abs(row["g"] - 4.0) < 1e-9
    assert out.df.columns == ["g"]


def test_udaf_sql_registration(ctx):
    from datafusion_python_spark.api.udf import udaf
    from datafusion_python_spark.suite_udf import GeoMean

    gm = udaf(GeoMean, ["double"], "double", name="geomean_sql_r2")
    ctx.register_udaf(gm)
    ctx.from_pylist(
        [
            {"g": 1, "x": 2.0},
            {"g": 1, "x": 8.0},
            {"g": 2, "x": 5.0},
        ],
        name="udaf_sql_t",
    )
    rows = ctx.sql(
        "SELECT g, geomean_sql_r2(x) AS gm FROM udaf_sql_t GROUP BY g ORDER BY g"
    ).df.collect()
    assert abs(rows[0]["gm"] - 4.0) < 1e-9
    assert abs(rows[1]["gm"] - 5.0) < 1e-9
    # also usable directly in native groupBy().agg via the same Arrow UDF
    native = (
        ctx.table("udaf_sql_t").df.groupBy("g").agg(gm._grouped_agg()("x").alias("gm"))
    )
    assert {r["g"]: round(r["gm"], 6) for r in native.collect()} == {1: 4.0, 2: 5.0}


def test_ordered_agg_desc_string_key(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("c", 3), (None, 4)], ["s", "v"]
    )
    out = df.agg(
        dpf.array_agg(
            col("v"), order_by=[col("s").sort(ascending=False, nulls_first=False)]
        ).expr.alias("vals"),
        dpf.first_value(
            col("v"), order_by=[col("s").sort(ascending=False, nulls_first=False)]
        ).expr.alias("first_desc"),
        dpf.string_agg(
            col("v").cast("string") if hasattr(col("v"), "cast") else col("v"),
            "-",
            order_by=[col("s").sort(ascending=True, nulls_first=True)],
        ).expr.alias("asc_nf"),
    ).first()
    assert out["vals"] == [3, 2, 1, 4]  # c, b, a, null(last)
    assert out["first_desc"] == 3
    assert out["asc_nf"] == "4-1-2-3"  # null first, then a, b, c


def test_ordered_agg_desc_timestamp_key(spark):
    df = spark.createDataFrame(
        [("2024-01-02", 1), ("2024-03-01", 2), ("2023-12-31", 3)], ["d", "v"]
    ).select(F.col("d").cast("timestamp").alias("d"), "v")
    out = df.agg(
        dpf.array_agg(col("v"), order_by=[col("d").sort(ascending=False)]).expr.alias("vals")
    ).first()
    assert out["vals"] == [2, 1, 3]


def test_array_agg_null_treatment(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], ["v"])
    out = df.agg(
        dpf.array_agg(col("v"), order_by=[col("v").sort(nulls_first=False)]).expr.alias("keep"),
        dpf.array_agg(
            col("v"),
            order_by=[col("v").sort(nulls_first=False)],
            null_treatment="ignore nulls",
        ).expr.alias("drop"),
        dpf.array_agg(col("v"), null_treatment="ignore nulls").expr.alias("drop_unord"),
    ).first()
    # DataFusion keeps nulls by default (Spark's collect_list would drop them)
    assert out["keep"] == [1, 3, None]
    assert out["drop"] == [1, 3]
    assert sorted(out["drop_unord"]) == [1, 3]


def test_weighted_percentile(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 3), (10.0, 1)], ["x", "w"])
    got = df.agg(
        dpf.approx_percentile_cont_with_weight(col("x"), col("w"), 0.5).expr.alias("p")
    ).first()["p"]
    assert got == 2.0


def test_like_escape(spark):
    df = spark.createDataFrame([("100%_x",), ("100ab",)], ["s"])
    e = Expr(F.col("s")).like("100!%!_%", escape="!").expr
    got = [r["m"] for r in df.select(e.alias("m")).collect()]
    assert got == [True, False]


def test_fill_nan_leaves_nulls(spark):
    df = DataFrame(
        spark.createDataFrame([(1.0,), (float("nan"),), (None,)], ["x"])
    )
    rows = [r["x"] for r in df.fill_nan(0.0).df.collect()]
    assert rows[0] == 1.0 and rows[1] == 0.0 and rows[2] is None


def test_date_bin_floor_before_origin(spark):
    df = spark.createDataFrame([("2000-12-31 23:45:00",)], ["t"]).select(
        F.col("t").cast("timestamp").alias("t")
    )
    origin = Expr(F.lit("2001-01-01 00:00:00").cast("timestamp"))
    binned = dpf.date_bin("1 hour", Expr(F.col("t")), origin).expr
    got = df.select(binned.cast("string").alias("b")).first()["b"]
    assert got == "2000-12-31 23:00:00"  # floor, not truncate-toward-zero


def test_date_bin_calendar_strides(spark):
    """Month/year strides: bins are origin + k*stride calendar months
    (DataFusion date_bin month semantics). Cross-checked against
    DuckDB's time_bucket for month-aligned origins — where the two
    engines agree — plus a pinned mid-month-origin case (DataFusion
    anchors at the origin's day; DuckDB's time_bucket does not)."""
    import duckdb

    rows = [
        "2019-12-31 23:59:59",
        "2020-01-15 10:00:00",
        "2020-02-29 00:00:00",
        "2020-03-01 00:00:00",
        "2021-07-04 12:30:00",
        "1969-06-01 00:00:00",
        "2024-11-15 00:00:00",
    ]
    df = spark.createDataFrame([(r,) for r in rows], ["t"]).select(
        F.col("t").cast("timestamp").alias("t")
    )
    for stride, origin in [
        ("1 month", "2020-01-01"),
        ("3 months", "1970-01-01"),
        ("1 year", "1970-01-01"),
    ]:
        o = Expr(F.lit(origin).cast("timestamp"))
        got = [
            r["b"]
            for r in df.select(
                dpf.date_bin(stride, Expr(F.col("t")), o).expr.cast("string").alias("b")
            ).collect()
        ]
        vals = ",".join(f"('{r}')" for r in rows)
        want = [
            str(r[0])
            for r in duckdb.sql(
                f"select time_bucket(INTERVAL '{stride}', ts::timestamp, "
                f"TIMESTAMP '{origin}') from (values {vals}) v(ts)"
            ).fetchall()
        ]
        assert got == want, f"{stride} from {origin}"
    # mid-month origin: bins anchor at the origin's day-of-month
    o = Expr(F.lit("2020-01-15").cast("timestamp"))
    got = (
        df.filter(F.col("t") == "2020-02-29 00:00:00")
        .select(dpf.date_bin("2 months", Expr(F.col("t")), o).expr.cast("string").alias("b"))
        .first()["b"]
    )
    assert got == "2020-01-15 00:00:00"


def test_range_negative_step(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    got = df.select(dpf.range(10, 4, -2).expr.alias("r")).first()["r"]
    assert got == [10, 8, 6]
    got2 = df.select(dpf.range(0, 5).expr.alias("r")).first()["r"]
    assert got2 == [0, 1, 2, 3, 4]


def test_gcd_fibonacci_worst_case(spark):
    # consecutive Fibonacci numbers are Euclid's worst case; F(80)/F(81)
    a, b = 23416728348467685, 37889062373143906
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(dpf.gcd(col("a"), col("b")).expr.alias("g")).first()["g"]
    assert got == math.gcd(a, b) == 1


def test_array_normalize_and_replace_n(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    norm = df.select(
        dpf.array_normalize(Expr(F.array(F.lit(3.0), F.lit(4.0)))).expr.alias("n")
    ).first()["n"]
    assert [round(v, 6) for v in norm] == [0.6, 0.8]
    rep = df.select(
        dpf.array_replace_n(
            Expr(F.array(F.lit(1), F.lit(1), F.lit(1), F.lit(2))), lit(1), lit(9), lit(2)
        ).expr.alias("r")
    ).first()["r"]
    assert rep == [9, 9, 1, 2]


def test_unnest_recursions(spark):
    df = DataFrame(
        spark.createDataFrame([([[1, 2], [3]],)], ["a"])
    )
    once = df.unnest_columns("a")
    assert dict(once.df.dtypes)["a"].startswith("array")
    twice = df.unnest_columns("a", recursions=2)
    assert [r["a"] for r in twice.df.collect()] == [1, 2, 3]


def test_udwf_bounded_frame(spark):
    import pyarrow as pa

    from datafusion_python_spark.api.udf import WindowEvaluator, udwf

    class SlidingSum(WindowEvaluator):
        def uses_window_frame(self):
            return True

        def evaluate(self, values, eval_range):
            s, e = eval_range
            return pa.scalar(sum(values[0][s:e].to_pylist()))

    df = DataFrame(spark.createDataFrame([("a", i) for i in range(5)], ["g", "v"]))
    w = udwf(SlidingSum, ["int64"], "bigint", name="ssum")
    out = w.apply(df, ["g"], ["v"], ["v"], "s", frame=(1, 0))
    assert [r["s"] for r in out.df.orderBy("v").collect()] == [0, 1, 3, 5, 7]


def test_udwf_with_rank(spark):
    import pyarrow as pa

    from datafusion_python_spark.api.udf import WindowEvaluator, udwf

    class RankEval(WindowEvaluator):
        def include_rank(self):
            return True

        def evaluate_all_with_rank(self, num_rows, ranked):
            out = [0] * num_rows
            for s, e in ranked:
                for i in range(s, e):
                    out[i] = s + 1
            return pa.array(out, type=pa.int64())

    df = DataFrame(spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)], ["g", "v"]))
    w = udwf(RankEval, [], "bigint", name="rk")
    out = w.apply(df, ["g"], ["v"], [], "r")
    assert sorted(r["r"] for r in out.df.collect()) == [1, 1, 3]


def test_recursive_cte(ctx):
    rows = ctx.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 4) "
        "SELECT n FROM t ORDER BY n"
    ).df.collect()
    assert [r["n"] for r in rows] == [1, 2, 3, 4]


def test_copy_to(ctx, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("copy") / "n.parquet")
    spark.range(7).createOrReplaceTempView("copy_src")
    res = ctx.sql(f"COPY (SELECT id FROM copy_src WHERE id < 5) TO '{out}' STORED AS parquet")
    assert res.df.first()["count"] == 5
    assert spark.read.parquet(out).count() == 5
    # DML gate still blocks COPY
    from datafusion_python_spark.api.context import SQLOptions

    with pytest.raises(ValueError):
        ctx.sql(
            f"COPY copy_src TO '{out}'", options=SQLOptions().with_allow_dml(False)
        )


def test_catalog_provider(ctx, spark):
    from datafusion_python_spark.api.catalog import (
        InMemoryCatalogProvider,
        InMemorySchemaProvider,
    )

    schema = InMemorySchemaProvider({"vals": DataFrame(spark.range(3))})
    provider = InMemoryCatalogProvider({"main": schema})
    ctx.register_catalog_provider("mycat", provider)
    cat = ctx.catalog("mycat")
    assert cat.names() == {"main"}
    assert cat.schema("main").table_exist("vals")
    views = ctx.materialize_provider_tables("mycat")
    assert views == ["mycat__main__vals"]
    assert ctx.sql("SELECT count(*) AS n FROM mycat__main__vals").df.first()["n"] == 3


def test_ivf_full_probe_equals_exact(spark):
    from datafusion_python_spark.operators.similarity import cosine_topk, ivf_ann
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(corpus, q, k=10).collect()]
    # probing every cell makes IVF exhaustive — must equal brute force
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivf_ann(corpus, q, n_list=8, n_probe=8, k=10).collect()
    ]
    assert full == exact
    # partial probe returns k rows (approximate path)
    part = ivf_ann(corpus, q, n_list=8, n_probe=2, k=10).collect()
    assert len(part) == 10


def test_ivf_kmeans_refinement(spark):
    from datafusion_python_spark.operators.similarity import ivf_assign, ivf_centroids
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = ivf_centroids(emb, n_list=4)
    refined = ivf_centroids(emb, n_list=4, refine_iters=1)
    assert len(refined) == 4 and len(refined[0]) == 64
    assert refined != seeds  # the k-means pass moved the centroids
    # refined centroids still produce a full assignment
    cells = ivf_assign(emb, refined).select("ivf_cell").distinct().count()
    assert 1 <= cells <= 4


def test_lsh_multi_probe_recall(spark):
    from datafusion_python_spark.operators.similarity import cosine_topk, lsh_bucket_ann
    from datafusion_python_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)
    exact_ids = {r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()}

    def recall(n_probes):
        got = {
            r["vec_id"]
            for r in lsh_bucket_ann(corpus, q, n_planes=4, k=10, n_probes=n_probes).collect()
        }
        return len(got & exact_ids)

    # multi-probe recall is monotone in the probe count
    assert recall(8) >= recall(1)


def test_top_level_package_surface():
    import datafusion_python_spark as d

    assert not [n for n in d.__all__ if not hasattr(d, n)]
    # reference-style workflow through top-level names only
    df = d.read_parquet("/root/testdata/sf0.001/nation.parquet")
    out = df.aggregate(
        [d.col("n_regionkey")], [d.functions.count(d.lit(1)).alias("n")]
    )
    assert out.count() == 5
    lp = d.LogicalPlan(out)
    assert "Aggregate" in lp.display()
    ep = d.ExecutionPlan(out)
    assert ep.display()
    assert d.NullTreatment.IGNORE_NULLS.value == "ignore nulls"


def test_session_config_applied():
    from datafusion_python_spark import SessionConfig, SessionContext

    cfg = SessionConfig().with_target_partitions(24).with_batch_size(4096)
    c = SessionContext(cfg)
    assert c.spark.conf.get("spark.sql.shuffle.partitions") == "24"
    # restore the session default for other tests
    c.spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_csv_read_options(ctx, spark, tmp_path_factory):
    import datafusion_python_spark as d

    p = str(tmp_path_factory.mktemp("csvopts") / "t.csv")
    spark.createDataFrame([(1, "a"), (2, "b")], ["i", "s"]).coalesce(1).write.mode(
        "overwrite"
    ).option("header", "true").csv(p)
    opts = d.CsvReadOptions(has_header=True, delimiter=",")
    df = d.read_csv(p, options=opts)
    assert df.count() == 2
    with pytest.raises(ValueError):
        d.CsvReadOptions(delimiter=",,")


def test_sql_options_with_cte_dml(ctx):
    from datafusion_python_spark.api.context import SQLOptions

    opts = SQLOptions().with_allow_dml(False)
    with pytest.raises(ValueError):
        ctx.sql("WITH t AS (SELECT 1) INSERT INTO x SELECT * FROM t", options=opts)
    with pytest.raises(ValueError):
        ctx.sql("/* c */ insert into x values (1)", options=opts)
    # string literal containing 'insert' is fine
    assert ctx.sql("SELECT 'insert' AS s", options=opts).df.first()["s"] == "insert"
