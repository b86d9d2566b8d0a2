"""common.py metadata types, input plugins, io module, GroupingSet.

Mirrors the reference's tests/test_input.py, the grouping-set examples
in python/datafusion/expr.py:1737-1860, and the common-module surface
(crates/core/src/common/{schema,data_type}.rs).
"""

import pytest

import datafusion_python_spark as dfn
from datafusion_python_spark.api.context import TableProviderExportable  # noqa: F401
from datafusion_python_spark.api.expr import EXPR_TYPE_ERROR, GroupingSet
from datafusion_python_spark.common import (
    DataTypeMap,
    PythonType,
    SqlSchema,
    SqlTable,
    SqlType,
    SqlView,
)
from datafusion_python_spark.input.location import LocationInputPlugin


def test_datatypemap_parquet_and_arrow():
    import pyarrow as pa

    m = DataTypeMap.from_parquet_type_str("int64")
    assert m.python_type is PythonType.Int
    assert m.sql_type is SqlType.BIGINT
    assert m.arrow_type.data_type == pa.int64()
    # INT96 is deprecated parquet; maps to ns timestamp
    assert DataTypeMap.from_parquet_type_str("INT96").sql_type is SqlType.TIMESTAMP
    assert DataTypeMap.arrow_str("utf8").sql_type is SqlType.VARCHAR
    assert DataTypeMap.arrow(pa.list_(pa.int32())).python_type is PythonType.List
    assert DataTypeMap.sql(SqlType.DOUBLE).python_type is PythonType.Float
    with pytest.raises(ValueError):
        DataTypeMap.from_parquet_type_str("not_a_type")


def test_location_input_plugin(sf_dir):
    plugin = LocationInputPlugin()
    assert plugin.is_correct_input(f"{sf_dir}/nation.parquet", "nation")
    assert not plugin.is_correct_input(42, "nation")
    tbl = plugin.build_table(f"{sf_dir}/nation.parquet", "nation")
    assert tbl.name == "nation"
    assert len(tbl.columns) >= 3
    assert tbl.statistics.getRowCount() == 25
    assert tbl.filepaths[0].endswith("nation.parquet")
    with pytest.raises(RuntimeError, match="not supported"):
        plugin.build_table("file.orc", "t")


def test_sql_schema_container():
    s = SqlSchema("main")
    t = SqlTable("t1", [("a", DataTypeMap.arrow_str("int64"))], 10.0)
    s.add_table(t)
    s.views.append(SqlView("v1", "SELECT * FROM t1"))
    assert s.table_by_name("t1") is t
    assert s.table_by_name("nope") is None
    s.drop_table("t1")
    assert s.tables == []
    assert s.views[0].definition == "SELECT * FROM t1"


def test_io_module(sf_dir):
    from datafusion_python_spark.io import read_parquet

    assert read_parquet(f"{sf_dir}/region.parquet").count() == 5


def test_expr_type_error_constant():
    assert "col()" in EXPR_TYPE_ERROR


def test_grouping_set_rollup_cube(spark_ctx):
    df = spark_ctx.from_pydict({"a": [1, 1, 2], "b": [10, 20, 30]})
    r = df.aggregate(
        [GroupingSet.rollup(dfn.col("a"))],
        [dfn.functions.sum(dfn.col("b")).alias("s")],
    )
    assert sorted(r.collect_column("s").to_pylist()) == [30, 30, 60]
    r = df.aggregate(
        [GroupingSet.cube(dfn.col("a"))],
        [dfn.functions.sum(dfn.col("b")).alias("s")],
    )
    assert sorted(r.collect_column("s").to_pylist()) == [30, 30, 60]


def test_grouping_set_grouping_sets(spark_ctx):
    # the reference docstring's example data (expr.py:1841)
    df = spark_ctx.from_pydict({"a": [1, 1, 2], "b": [4, 5, 5], "c": [1, 2, 3]})
    r = df.aggregate(
        [GroupingSet.grouping_sets([dfn.col("a")], [dfn.col("b")])],
        [dfn.functions.sum(dfn.col("c")).alias("s")],
    )
    assert sorted(r.collect_column("s").to_pylist()) == [1, 3, 3, 5]


def test_grouping_set_must_be_sole_entry(spark_ctx):
    df = spark_ctx.from_pydict({"a": [1], "b": [2]})
    with pytest.raises(ValueError, match="sole group_by"):
        df.aggregate(
            [GroupingSet.rollup(dfn.col("a")), dfn.col("b")],
            [dfn.functions.count(dfn.col("a"))],
        )
