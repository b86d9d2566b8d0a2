"""Substrait interchange tests (ref python/tests/test_substrait.py).

Mirrors the reference round-trip shape — serialize SQL → plan → bytes →
deserialize → consume → DataFrame — and strengthens it: the consumed
DataFrame must produce the same rows as executing the SQL directly.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from datafusion_python_spark.api import substrait as ss
from datafusion_python_spark.api.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3]), pa.array([4, 5, 6])], names=["a", "b"]
    )
    c.register_record_batches("t", [[batch]])
    return c


def _consumed_rows(ctx, plan):
    lp = ss.Consumer.from_substrait_plan(ctx, plan)
    df = ctx.create_dataframe_from_logical_plan(lp)
    return sorted(map(str, df.df.collect()))


def test_substrait_serialization(ctx):
    """Reference test shape: serialize, encode, deserialize, consume,
    create_dataframe_from_logical_plan (+ produce from the df's plan)."""
    substrait_plan = ss.Serde.serialize_to_plan("SELECT * FROM t", ctx)
    substrait_bytes = substrait_plan.encode()
    assert isinstance(substrait_bytes, bytes)
    substrait_bytes = ss.Serde.serialize_bytes("SELECT * FROM t", ctx)
    substrait_plan = ss.Serde.deserialize_bytes(substrait_bytes)
    logical_plan = ss.Consumer.from_substrait_plan(ctx, substrait_plan)
    df = ctx.create_dataframe_from_logical_plan(logical_plan)
    assert sorted(r.a for r in df.df.collect()) == [1, 2, 3]
    # produce from a DataFrame's plan (the wrapper accepts the frame or
    # a LogicalPlan wrapper; DataFrame.logical_plan() here returns the
    # Catalyst display string, so pass the frame itself)
    plan2 = ss.Producer.to_substrait_plan(df, ctx)
    assert plan2.plan_internal.get("relations")


@pytest.mark.parametrize("path_to_str", [True, False])
def test_substrait_file_serialization(ctx, tmp_path, path_to_str):
    path = tmp_path / "substrait_plan"
    path = str(path) if path_to_str else path
    sql_command = "SELECT * FROM t"
    ss.Serde.serialize(sql_command, ctx, path)
    expected_plan = ss.Serde.serialize_to_plan(sql_command, ctx)
    actual_plan = ss.Serde.deserialize(path)
    assert expected_plan.plan_internal == actual_plan.plan_internal
    assert _consumed_rows(ctx, expected_plan) == _consumed_rows(ctx, actual_plan)


def test_json_round_trip(ctx):
    plan = ss.Serde.serialize_to_plan("SELECT a FROM t WHERE b > 4", ctx)
    text = plan.to_json()
    again = ss.Plan.from_json(text)
    assert again.plan_internal == plan.plan_internal


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM t",
        "SELECT a, a + b FROM t WHERE b > 4 AND a < 3",
        "SELECT a, sum(b) AS s, count(*) AS n FROM t GROUP BY a",
        "SELECT * FROM t ORDER BY b DESC LIMIT 2",
        "SELECT t1.a, t2.b FROM t t1 JOIN t t2 ON t1.a = t2.a",
        "SELECT DISTINCT a FROM t",
        "SELECT a FROM t UNION ALL SELECT b FROM t",
    ],
)
def test_consume_matches_direct_execution(ctx, sql):
    data = ss.Serde.serialize_bytes(sql, ctx)
    plan = ss.Serde.deserialize_bytes(data)
    got = _consumed_rows(ctx, plan)
    want = sorted(map(str, ctx.spark.sql(sql).collect()))
    assert got == want, sql


def test_wire_codec_identity(ctx):
    plan = ss.Serde.serialize_to_plan(
        "SELECT a, sum(b) AS s FROM t WHERE b > 4 GROUP BY a ORDER BY a", ctx
    )
    assert ss.Serde.deserialize_bytes(plan.encode()).plan_internal == plan.plan_internal


def test_unsupported_raises(ctx):
    with pytest.raises(NotImplementedError, match="substrait produce"):
        # window functions are outside the supported relational core
        ss.Serde.serialize_to_plan(
            "SELECT a, row_number() OVER (ORDER BY b) FROM t", ctx
        )
