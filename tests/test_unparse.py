"""Plan → SQL unparser tests (ref python/datafusion/unparser.py:27-80).

Round-trip: build a query as a DataFrame pipeline, unparse the analyzed
plan to SQL, execute the SQL, and require identical results — the
strongest check that the emitted text means the same thing.
"""

from __future__ import annotations

import pytest

from datafusion_python_spark.api.substrait import Dialect, Unparser
from datafusion_python_spark.suite_tpch import TPCH_QUERIES


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize("q", ["tpch_q1", "tpch_q3", "tpch_q6"])
def test_roundtrip_tpch(spark, sf_dir, q):
    df = TPCH_QUERIES[q][0](spark, sf_dir)
    sql = Unparser().plan_to_sql(df)
    assert sql.startswith("SELECT")
    assert _rows(spark.sql(sql)) == _rows(df)


def test_roundtrip_window_limit_union(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datafusion_python_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    df = (
        ev.select("user_id", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .orderBy("user_id", "rn")
        .limit(40)
    )
    sql = Unparser().plan_to_sql(df)
    assert _rows(spark.sql(sql)) == _rows(df)

    u = ev.select("user_id").union(ev.select("event_id")).distinct()
    sql_u = Unparser().plan_to_sql(u)
    assert _rows(spark.sql(sql_u)) == _rows(u)


def test_dialect_quoting_and_pretty(spark, sf_dir):
    df = TPCH_QUERIES["tpch_q6"][0](spark, sf_dir)
    default = Unparser(Dialect.default()).plan_to_sql(df)
    duck = Unparser(Dialect.duckdb()).plan_to_sql(df)
    assert "`" in default and "`" not in duck and '"' in duck
    pretty = Unparser().with_pretty(True).plan_to_sql(df)
    assert "\nFROM " in pretty


def test_unsupported_node_raises(spark):
    df = spark.createDataFrame([(1,)], "x: long")  # LocalRelation leaf
    with pytest.raises(NotImplementedError, match="unparse"):
        Unparser().plan_to_sql(df)


def test_roundtrip_setops_and_semi_anti_joins(spark):
    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    ctx.from_pydict({"x": [1, 2, 2, 3]}, "t_unp_a")
    ctx.from_pydict({"x": [2, 3], "y": [20, 30]}, "t_unp_b")
    a, b = ctx.table("t_unp_a"), ctx.table("t_unp_b")
    cases = [
        (a.except_all(b[["x"]]), [1, 2]),
        (a.intersect(b[["x"]]), [2, 3]),
        (a.intersect(b[["x"]], distinct=False), [2, 3]),
        (a.join(b, on="x", how="semi"), [2, 2, 3]),
        (a.join(b, on="x", how="anti"), [1]),
        (a.join(b, on="x", how="inner"), [2, 2, 3]),
    ]
    for df, expect in cases:
        sql = Unparser().plan_to_sql(df)
        got = sorted(r["x"] for r in ctx.sql(sql).to_pylist())
        assert got == expect, sql


def test_roundtrip_local_relation_values(spark):
    import datetime

    from datafusion_python_spark.api.context import SessionContext
    from datafusion_python_spark.api.expr import col

    ctx = SessionContext()
    # in-memory frames (LocalRelation) unparse as VALUES — incl. string
    # escaping, dates and timestamps
    df = ctx.from_pydict({"a": [1, 2, 3], "s": ["x", "it's", "z"]})
    flt = df.filter(col("a") > 1)
    sql = Unparser().plan_to_sql(flt)
    assert "VALUES" in sql and "it''s" in sql
    assert sorted(r["a"] for r in ctx.sql(sql).to_pylist()) == [2, 3]
    d2 = ctx.from_pydict(
        {"d": [datetime.date(2024, 1, 5)], "t": [datetime.datetime(2024, 1, 5, 3, 4, 5)]}
    )
    assert ctx.sql(Unparser().plan_to_sql(d2)).to_pylist() == d2.to_pylist()
    # typed empty relation keeps its schema
    import pyarrow as pa

    empty = ctx.from_arrow(pa.table({"a": pa.array([], "int64")}))
    out = ctx.sql(Unparser().plan_to_sql(empty))
    assert out.to_pylist() == [] and dict(out.df.dtypes)["a"] == "bigint"
