"""Stream-static enrichment: live micro-batch joins against static
dimensions, broadcast plan shape, and SCD2 point-in-time versions."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datafusion_python_spark.streaming import enrich_stream, scd2_enrich_stream


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def _events_stream(spark, tmp_path):
    rows = [
        (1, 10, _ts(5)),
        (2, 10, _ts(15)),
        (3, 20, _ts(10)),
        (4, 99, _ts(10)),  # key with no dimension row
    ]
    batch = spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")
    path = str(tmp_path / "enrich_src")
    batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path)


def _run(sdf, spark, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_enrich_stream_joins_dimension(spark, tmp_path):
    dim = spark.createDataFrame(
        [(10, "alpha"), (20, "beta")], "user_id: long, segment: string"
    )
    stream = _events_stream(spark, tmp_path)
    out = _run(
        enrich_stream(stream, dim, "user_id", prefix="u_"), spark, "enriched"
    ).collect()
    got = {r.event_id: r.u_segment for r in out}
    assert got == {1: "alpha", 2: "alpha", 3: "beta", 4: None}


def test_enrich_stream_broadcasts(spark, tmp_path):
    dim = spark.createDataFrame([(10, "x")], "user_id: long, seg: string")
    stream = _events_stream(spark, tmp_path)
    joined = enrich_stream(stream, dim, "user_id")
    # logical plan must carry the broadcast hint so each micro-batch
    # avoids shuffling the stream side
    assert "broadcast" in joined._jdf.queryExecution().logical().toString().lower()


def test_scd2_picks_covering_version(spark, tmp_path):
    dim = spark.createDataFrame(
        [
            (10, _ts(1), _ts(10), "v1"),
            (10, _ts(10), None, "v2"),
            (20, _ts(12), None, "late"),  # starts after event 3's ts
        ],
        "user_id: long, valid_from: timestamp, valid_to: timestamp, tier: string",
    )
    stream = _events_stream(spark, tmp_path)
    out = _run(
        scd2_enrich_stream(stream, dim, "user_id", ts_col="ts"), spark, "scd2"
    ).collect()
    got = {r.event_id: r.tier for r in out}
    # event1 ts=day5 -> v1; event2 ts=day15 -> v2; event3 ts=day10 before
    # its version's start -> null; event4 unknown key -> null; all kept
    assert got == {1: "v1", 2: "v2", 3: None, 4: None}
