"""Gap filling: densification, LOCF, linear interpolation — against
hand-computed series."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_python_spark.operators.gapfill import (
    _stride_seconds,
    bucket_aggregate,
    gapfill,
)


def _sparse(spark, rows):
    """rows: (key, bucket_epoch_secs, value)"""
    return spark.createDataFrame(rows, "k: string, bucket: long, v: double")


def test_stride_parsing():
    assert _stride_seconds("1 hour") == 3600
    assert _stride_seconds("15 minutes") == 900
    assert _stride_seconds("2 days") == 172800


def test_densify_marks_gaps(spark):
    sp = _sparse(spark, [("a", 0, 1.0), ("a", 7200, 3.0)])
    out = gapfill(sp, ["k"], ["v"], "1 hour", method="null").orderBy("bucket").collect()
    assert [(r.bucket, r.is_gap) for r in out] == [
        (0, False),
        (3600, True),
        (7200, False),
    ]


def test_locf_carries_forward(spark):
    sp = _sparse(spark, [("a", 0, 1.0), ("a", 10800, 4.0)])
    out = gapfill(sp, ["k"], ["v"], "1 hour", method="locf").orderBy("bucket").collect()
    assert [r.v for r in out] == [1.0, 1.0, 1.0, 4.0]


def test_linear_interpolates(spark):
    sp = _sparse(spark, [("a", 0, 1.0), ("a", 10800, 4.0)])
    out = (
        gapfill(sp, ["k"], ["v"], "1 hour", method="linear").orderBy("bucket").collect()
    )
    assert [r.v for r in out] == [1.0, 2.0, 3.0, 4.0]


def test_keys_fill_independently(spark):
    sp = _sparse(
        spark,
        [("a", 0, 1.0), ("a", 7200, 3.0), ("b", 3600, 10.0), ("b", 10800, 20.0)],
    )
    out = gapfill(sp, ["k"], ["v"], "1 hour", method="linear").collect()
    got = {(r.k, r.bucket): r.v for r in out}
    assert got[("a", 3600)] == 2.0
    assert got[("b", 7200)] == 15.0
    # b's axis starts at ITS first observation, not a's
    assert ("b", 0) not in got


def test_locf_multiple_value_cols(spark):
    sp = spark.createDataFrame(
        [("a", 0, 1.0, 100.0), ("a", 7200, 3.0, 300.0)],
        "k: string, bucket: long, v: double, w: double",
    )
    out = (
        gapfill(sp, ["k"], ["v", "w"], "1 hour", method="locf")
        .orderBy("bucket")
        .collect()
    )
    assert (out[1].v, out[1].w) == (1.0, 100.0)


def test_bucket_aggregate_alignment(spark, sf_dir):
    from datafusion_python_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sp = bucket_aggregate(ev, ["event_type"], "ts", {"n": F.count("*")}, "1 hour")
    r = sp.agg(F.min(F.col("bucket") % 3600)).first()[0]
    assert r == 0  # origin-aligned hour starts


def test_bad_method_raises(spark):
    sp = _sparse(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError):
        gapfill(sp, ["k"], ["v"], "1 hour", method="spline")
