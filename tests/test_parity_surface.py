"""Method-parity surface tests for round-2 additions: Expr scalar-method
forms / introspection / serialization, DataFrame alias/column/collect
variants, SessionContext arrow-batch ingestion, UDF registries, session
metadata."""

from __future__ import annotations

import ast
import pickle

import pyarrow as pa
import pytest

from datafusion_python_spark.api.context import SessionContext
from datafusion_python_spark.api.dataframe import DataFrame
from datafusion_python_spark.api.expr import Expr, col, lit


@pytest.fixture(scope="module")
def ctx():
    return SessionContext()


def _ref_methods(path, clsname):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == clsname:
            return {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    return set()


def test_method_parity_vs_reference():
    for cls, path, ours in [
        ("Expr", "/root/reference/python/datafusion/expr.py", Expr),
        ("DataFrame", "/root/reference/python/datafusion/dataframe.py", DataFrame),
        ("SessionContext", "/root/reference/python/datafusion/context.py", SessionContext),
    ]:
        missing = sorted(n for n in _ref_methods(path, cls) if not hasattr(ours, n))
        assert missing == [], f"{cls} missing {missing}"


def test_expr_method_forms(ctx):
    d = ctx.from_pydict({"x": [-2.0, 9.0], "s": ["Ab", "cD"]})
    out = d.select(
        col("x").abs().alias("a"),
        col("x").sqrt().alias("r"),
        col("s").upper().alias("u"),
        col("s").lower().md5().alias("h"),
        col("s").length().alias("n"),
    ).to_pylist()
    assert [r["a"] for r in out] == [2.0, 9.0]
    assert out[1]["r"] == 3.0
    assert [r["u"] for r in out] == ["AB", "CD"]
    assert len(out[0]["h"]) == 32
    assert [r["n"] for r in out] == [2, 2]


def test_expr_array_method_forms(ctx):
    d = ctx.from_pydict({"v": [[1, 2, 2, 3]]})
    out = d.select(
        col("v").array_distinct().alias("d"),
        col("v").array_length().alias("n"),
        col("v").cardinality().alias("c"),
        col("v").array_pop_back().alias("pb"),
    ).to_pylist()[0]
    assert sorted(out["d"]) == [1, 2, 3]
    assert out["n"] == 4 and out["c"] == 4
    assert out["pb"] == [1, 2, 2]


def test_expr_introspection_and_serialization(ctx):
    e = lit(42)
    assert e.python_value() == 42
    assert e.variant_name() == "Literal"
    from datafusion_python_spark.common import RexType

    assert e.rex_type() == RexType.Literal
    assert col("x").rex_type() == RexType.Reference
    call = col("x") + lit(1)
    assert call.rex_type() == RexType.Call
    with pytest.raises(ValueError):
        col("x").python_value()

    # round-trip serialization (and pickle protocol)
    rt = Expr.from_bytes((lit(7) + lit(35)).to_bytes())
    d = ctx.from_pydict({"one": [1]})
    assert d.select(rt.alias("v")).to_pylist() == [{"v": 42}]
    rt2 = pickle.loads(pickle.dumps(lit("hi")))
    assert d.select(rt2.alias("s")).to_pylist() == [{"s": "hi"}]


def test_expr_window_builder_chain(ctx):
    d = ctx.from_pydict({"g": ["a", "a", "b"], "x": [1, 2, 5]})
    from datafusion_python_spark.api import functions as f

    w = f.sum(col("x")).partition_by(col("g")).order_by(col("x")).build()
    out = sorted(
        d.select(col("g"), col("x"), w.alias("rs")).to_pylist(),
        key=lambda r: (r["g"], r["x"]),
    )
    assert [r["rs"] for r in out] == [1, 3, 5]


def test_dataframe_alias_column_collects(ctx):
    d = ctx.from_pydict({"k": [1, 2], "v": [10.0, 20.0]})
    a, b = d.alias("a"), d.alias("b")
    joined = a.join(b, left_on="k", right_on="k")
    assert joined.count() == 2
    assert d.column("v").column_name() == "v"
    assert [e.column_name() for e in d.find_qualified_columns("k", "v")] == ["k", "v"]
    colv = d.collect_column("v")
    assert sorted(colv.to_pylist()) == [10.0, 20.0]
    parts = d.df.repartition(2).sparkSession.createDataFrame(d.to_pylist())  # noqa: F841
    pp = DataFrame(d.df.repartition(2)).collect_partitioned()
    flat = [r for part in pp for b_ in part for r in b_.to_pylist()]
    assert sorted(r["k"] for r in flat) == [1, 2]
    s = DataFrame.default_str_repr(d.collect(), d.schema(), False)
    assert "k" in s


def test_ctx_arrow_batches_and_read_table(ctx):
    batch = pa.record_batch({"x": pa.array([1, 2, 3])})
    assert ctx.read_batch(batch).count() == 3
    assert ctx.read_batches([batch, batch]).count() == 6
    ctx.register_batch("rb_t", batch)
    assert ctx.table_exist("rb_t")
    assert ctx.read_table(ctx.table("rb_t")).count() == 3
    ctx.register_arrow("ra_t", pa.table({"y": [1]}))
    assert ctx.table("ra_t").count() == 1


def test_ctx_udf_registries(ctx):
    import pyarrow.compute as pc
    from datafusion_python_spark.api.udf import udf

    my = udf(lambda a: pc.add(a, 1), [pa.int64()], pa.int64(), "stable", name="parity_inc")
    ctx.register_udf(my)
    assert "parity_inc" in ctx.udfs()
    assert ctx.udf("parity_inc") is my
    with pytest.raises(KeyError):
        ctx.udaf("parity_inc")
    ctx.deregister_udf("parity_inc")
    assert "parity_inc" not in ctx.udfs()
    assert ctx.udafs() == [] or isinstance(ctx.udafs(), list)


def test_ctx_session_metadata(ctx):
    assert len(ctx.session_id()) == 36
    assert ctx.session_id() == ctx.session_id()
    assert "T" in ctx.session_start_time()
    assert ctx.enable_ident_normalization() is True
    assert SessionContext.parse_capacity_limit("mem", "100M") == 100 * 1024 * 1024
    with pytest.raises(ValueError):
        SessionContext.parse_capacity_limit("mem", "12Q")
    g = SessionContext.global_ctx()
    assert g is SessionContext.global_ctx()
    with pytest.raises(NotImplementedError):
        ctx.add_physical_optimizer_rule(object())
    assert ctx.enable_spark_functions() is None
    assert ctx.with_python_udf_inlining(enabled=False) is ctx


def test_ctx_execute_logical_plan(ctx):
    from datafusion_python_spark.api.plan import LogicalPlan

    d = ctx.from_pydict({"x": [1, 2, 3]})
    plan = LogicalPlan(d)
    df2 = ctx.create_dataframe_from_logical_plan(plan)
    assert df2.count() == 3
    stream = ctx.execute(plan, 2)
    total = sum(b.to_pyarrow().num_rows for b in stream)
    assert total == 3
