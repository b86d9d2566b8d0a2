"""As-of / range join tests: fixed fixtures, a hypothesis property test
against pandas.merge_asof (an independent implementation of the same
semantics), and plan-shape pins (no cartesian products, no range
self-join)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from datafusion_python_spark.operators.temporal import asof_join, range_join
from datafusion_python_spark.plans.introspect import explain_str


def _fixtures(spark):
    trades = (
        spark.createDataFrame(
            [(1, 10.0, "A"), (5, 11.0, "A"), (3, 20.0, "B")],
            "t long, price double, sym string",
        )
        .withColumn("ts", F.timestamp_seconds(F.col("t")))
        .drop("t")
    )
    quotes = (
        spark.createDataFrame(
            [(0, 9.9, "A"), (4, 10.9, "A"), (6, 11.1, "A"), (10, 21.0, "B")],
            "t long, bid double, sym string",
        )
        .withColumn("ts", F.timestamp_seconds(F.col("t")))
        .drop("t")
    )
    return trades, quotes


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_backward(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert _rows(out, "price", "r_bid") == [(10.0, 9.9), (11.0, 10.9), (20.0, None)]


def test_asof_forward_and_nearest(spark):
    trades, quotes = _fixtures(spark)
    fwd = asof_join(trades, quotes, on="ts", by="sym", direction="forward")
    assert _rows(fwd, "price", "r_bid") == [(10.0, 10.9), (11.0, 11.1), (20.0, 21.0)]
    near = asof_join(trades, quotes, on="ts", by="sym", direction="nearest")
    # t=1: back gap 1 < fwd gap 3; t=5: tie -> backward; B t=3: only fwd
    assert _rows(near, "price", "r_bid") == [(10.0, 9.9), (11.0, 10.9), (20.0, 21.0)]


def test_asof_tolerance_nulls_far_matches(spark):
    trades, quotes = _fixtures(spark)
    out = asof_join(
        trades, quotes, on="ts", by="sym", tolerance=F.expr("INTERVAL 1 SECONDS")
    )
    assert _rows(out, "price", "r_bid") == [(10.0, 9.9), (11.0, 10.9), (20.0, None)]


def test_asof_exact_ts_is_inclusive(spark):
    left = spark.createDataFrame([(5, "A")], "t long, sym string").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    ).drop("t")
    right = spark.createDataFrame([(5, 1.5, "A")], "t long, bid double, sym string").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    ).drop("t")
    out = asof_join(left, right, on="ts", by="sym")
    assert _rows(out, "r_bid") == [(1.5,)]


def test_asof_rejects_bad_direction(spark):
    trades, quotes = _fixtures(spark)
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by="sym", direction="sideways")


@given(
    lts=st.lists(st.integers(0, 400), min_size=1, max_size=25),
    rts=st.lists(st.integers(0, 400), min_size=1, max_size=25),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, lts, rts, direction):
    # dedupe ts (merge_asof ties are underspecified for payload choice)
    lts, rts = sorted(set(lts)), sorted(set(rts))
    ldf = spark.createDataFrame([(t, "k") for t in lts], "t long, k string").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    )
    rdf = spark.createDataFrame(
        [(t, float(t), "k") for t in rts], "t long, v double, k string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t")))
    got = {
        r["t"]: r["r_v"]
        for r in asof_join(
            ldf.select("k", "t", "ts"),
            rdf.select("k", "v", "ts"),
            on="ts",
            by="k",
            direction=direction,
        ).collect()
    }
    exp_df = pd.merge_asof(
        pd.DataFrame({"ts": pd.to_datetime(lts, unit="s"), "t": lts}),
        pd.DataFrame({"ts": pd.to_datetime(rts, unit="s"), "v": [float(t) for t in rts]}),
        on="ts",
        direction=direction,
    )
    exp = {
        int(r.t): (None if pd.isna(r.v) else float(r.v)) for r in exp_df.itertuples()
    }
    assert got == exp


def test_range_join_matches_theta_join(spark):
    trades, quotes = _fixtures(spark)
    got = range_join(
        trades,
        quotes,
        by="sym",
        on="ts",
        lower=F.expr("INTERVAL -3 SECONDS"),
        upper=F.expr("INTERVAL 0 SECONDS"),
        bucket="2 seconds",
    )
    exp = (
        trades.alias("l")
        .join(
            quotes.alias("r"),
            (F.col("l.sym") == F.col("r.sym"))
            & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 3 SECONDS"))
            & (F.col("r.ts") <= F.col("l.ts")),
        )
        .select(F.col("l.price"), F.col("r.bid"))
    )
    assert _rows(got, "price", "r_bid") == _rows(exp, "price", "bid")


@given(
    lts=st.lists(st.integers(0, 300), min_size=1, max_size=20),
    rts=st.lists(st.integers(0, 300), min_size=1, max_size=20),
    span=st.sampled_from([5, 30, 77]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_theta_join_property(spark, lts, rts, span):
    ldf = spark.createDataFrame(
        [(i, t, "k") for i, t in enumerate(lts)], "lid long, t long, k string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    rdf = spark.createDataFrame(
        [(i, t, "k") for i, t in enumerate(rts)], "rid long, t long, k string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t"))).drop("t")
    got = range_join(
        ldf,
        rdf,
        by="k",
        on="ts",
        lower=F.expr(f"INTERVAL -{span} SECONDS"),
        upper=F.expr(f"INTERVAL {span} SECONDS"),
        bucket="13 seconds",
    )
    exp = {
        (l, r)
        for l, lt in enumerate(lts)
        for r, rt in enumerate(rts)
        if abs(rt - lt) <= span
    }
    assert {(r["lid"], r["r_rid"]) for r in got.collect()} == exp


def test_asof_plan_single_shuffle_no_join_explosion(spark):
    trades, quotes = _fixtures(spark)
    plan = explain_str(asof_join(trades, quotes, on="ts", by="sym"))
    # union+window form: no join operator at all, exactly one hash exchange
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("hashpartitioning") == 1


def test_range_join_plan_no_cartesian(spark, sf_dir):
    from datafusion_python_spark.suite_analytics import evt_range_join

    plan = explain_str(evt_range_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
