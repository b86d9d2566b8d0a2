"""Streaming + multimodal: drive each helper end-to-end (memory sink for
streams; real mapInPandas execution for media)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_python_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    resize_meta,
    synthetic_media,
)
from datafusion_python_spark.streaming import (
    running_total_per_key,
    sessionized_counts,
    tumbling_counts,
)
from datafusion_python_spark.tables import load_table


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    # replay the batch events table as a bounded stream: one parquet dir
    batch = load_table(spark, sf_dir, "events")
    path = "/tmp/_stream_events_src"
    batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path)


def _run_to_memory(sdf, name: str):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    return name


def _run_update_to_memory(sdf, name: str):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    return name


def test_tumbling_counts(spark, events_stream):
    out = tumbling_counts(events_stream, window="1 hour")
    _run_to_memory(out, "tumbling")
    rows = spark.sql("SELECT * FROM tumbling").collect()
    assert rows and all(r.n > 0 for r in rows)
    total = sum(r.n for r in rows)
    assert total == 1000  # sf0.001 events rows, each in exactly one window


def test_sessionized_counts(spark, events_stream):
    out = sessionized_counts(events_stream, gap="30 minutes")
    _run_to_memory(out, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    assert sum(r.n_events for r in rows) == 1000
    assert all(r.session_end > r.session_start for r in rows)


def test_stateful_running_total(spark, events_stream):
    out = running_total_per_key(events_stream)
    _run_update_to_memory(out, "running")
    rows = spark.sql("SELECT * FROM running").collect()
    assert rows
    got = sum(r.n_events for r in rows)
    assert got == 1000


def _run_append_to_memory(sdf, name: str):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return name


@pytest.fixture(scope="module")
def dup_events_stream(spark, sf_dir):
    # events replayed with every row duplicated — dedup input
    batch = load_table(spark, sf_dir, "events")
    path = "/tmp/_stream_events_dup_src"
    batch.union(batch).write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path)


def test_dedup_stream(spark, dup_events_stream):
    from datafusion_python_spark.streaming.dedup_join import dedup_stream

    out = dedup_stream(dup_events_stream, ["event_id"], watermark="1 hour")
    _run_append_to_memory(out, "dedup")
    rows = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup").first()
    assert rows.n == 1000 and rows.d == 1000  # 2000 in, duplicates dropped


def test_dedup_stream_by_fingerprint(spark, sf_dir):
    from datafusion_python_spark.streaming.dedup_join import dedup_stream_by_fingerprint

    ev = load_table(spark, sf_dir, "events").select(
        "ts", F.col("event_type").alias("text")
    )
    path = "/tmp/_stream_fp_src"
    ev.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    out = dedup_stream_by_fingerprint(stream, text_col="text", watermark="365 days")
    _run_append_to_memory(out, "fpdedup")
    n = spark.sql("SELECT count(*) AS n FROM fpdedup").first().n
    # one row per distinct event_type content fingerprint
    assert n == ev.select("text").distinct().count()


def test_interval_join_streams(spark, sf_dir):
    from datafusion_python_spark.streaming.dedup_join import interval_join_streams

    left_b = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    right_b = left_b.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE")).select(
        "event_id", "ts", F.col("value").alias("rv")
    )
    lp, rp = "/tmp/_stream_join_l", "/tmp/_stream_join_r"
    left_b.write.mode("overwrite").parquet(lp)
    right_b.write.mode("overwrite").parquet(rp)
    ls = spark.readStream.schema(left_b.schema).parquet(lp)
    rs = spark.readStream.schema(right_b.schema).parquet(rp)
    out = interval_join_streams(
        ls, rs, key="event_id", watermark="1 hour", max_delay="5 minutes"
    )
    _run_append_to_memory(out, "sjoin")
    n = spark.sql("SELECT count(*) AS n FROM sjoin").first().n
    assert n == 50  # every left row matches exactly its +1min twin


def test_interval_join_streams_left_outer(spark, sf_dir, tmp_path):
    """LEFT-OUTER stream-stream join: unmatched left rows emit with NULL
    right columns only after the watermark passes their join range —
    driven as data-batch then sentinel-carrier batch (one file per
    micro-batch, increasing mtimes), with the final nulls surfacing in
    the no-data eviction batch."""
    import os
    import shutil
    from datetime import timedelta

    from datafusion_python_spark.streaming.dedup_join import interval_join_streams

    left_b = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    right_b = (
        left_b.filter(F.col("event_id") % 2 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
        .select("event_id", "ts", F.col("value").alias("rv"))
    )
    mx = left_b.agg(F.max("ts")).first()[0]
    l_sent = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), -1, "__sentinel__", 0.0, "")], left_b.schema
    )
    r_sent = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), 0.0)], right_b.schema
    )

    dirs = {}
    for side, batches in {
        "l": [left_b, l_sent],
        "r": [right_b, r_sent],
    }.items():
        d = str(tmp_path / f"in_{side}")
        os.makedirs(d)
        for i, b in enumerate(batches):
            tmp = str(tmp_path / f"tmp_{side}{i}")
            b.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
            dst = os.path.join(d, f"b{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000_000 + 60 * i,) * 2)
        dirs[side] = d

    ls = (
        spark.readStream.schema(left_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["l"])
    )
    rs = (
        spark.readStream.schema(right_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["r"])
    )
    out = interval_join_streams(
        ls,
        rs,
        key="event_id",
        watermark="1 hour",
        max_delay="5 minutes",
        how="left_outer",
    )
    _run_append_to_memory(out, "sojoin")
    res = spark.sql(
        "SELECT count(*) AS n, count(r_rv) AS matched FROM sojoin WHERE event_id >= 0"
    ).first()
    # 25 even ids match their +1min twin; 25 odd ids emit with NULLs
    # once the sentinel batch pushes the watermark past their range;
    # the sentinel left row itself never evicts (nothing outlives its
    # own range) and is filtered by event_id
    assert (res.n, res.matched) == (50, 25)


def test_interval_join_streams_full_outer(spark, sf_dir, tmp_path):
    """FULL-OUTER: unmatched rows from BOTH sides emit after their join
    range falls behind the watermark; the key column is coalesced so
    right-only rows stay addressable."""
    import os
    import shutil
    from datetime import timedelta

    from datafusion_python_spark.streaming.dedup_join import interval_join_streams

    ev = load_table(spark, sf_dir, "events")
    left_b = ev.filter(F.col("event_id") < 50)
    right_b = (
        ev.filter((F.col("event_id") >= 25) & (F.col("event_id") < 75))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
        .select("event_id", "ts", F.col("value").alias("rv"))
    )
    mx = ev.agg(F.max("ts")).first()[0]
    l_sent = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), -1, "__sentinel__", 0.0, "")], left_b.schema
    )
    r_sent = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), 0.0)], right_b.schema
    )

    dirs = {}
    for side, batches in {"l": [left_b, l_sent], "r": [right_b, r_sent]}.items():
        d = str(tmp_path / f"fo_{side}")
        os.makedirs(d)
        for i, b in enumerate(batches):
            tmp = str(tmp_path / f"fo_tmp_{side}{i}")
            b.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
            dst = os.path.join(d, f"b{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_000_000_000 + 60 * i,) * 2)
        dirs[side] = d

    ls = (
        spark.readStream.schema(left_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["l"])
    )
    rs = (
        spark.readStream.schema(right_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dirs["r"])
    )
    out = interval_join_streams(
        ls,
        rs,
        key="event_id",
        watermark="1 hour",
        max_delay="5 minutes",
        how="full_outer",
    )
    _run_append_to_memory(out, "fojoin")
    res = spark.sql(
        "SELECT count(*) AS n, count(CASE WHEN r_rv IS NOT NULL AND value IS NOT NULL"
        " THEN 1 END) AS matched,"
        " count(CASE WHEN r_rv IS NULL THEN 1 END) AS left_only,"
        " count(CASE WHEN value IS NULL THEN 1 END) AS right_only"
        " FROM fojoin WHERE event_id >= 0"
    ).first()
    # ids 25-49 match their +1min twin; 0-24 are left-only; 50-74
    # right-only (their left columns NULL, key kept via coalesce)
    assert (res.n, res.matched, res.left_only, res.right_only) == (75, 25, 25, 25)


def test_rocksdb_state_store_provider(spark, sf_dir, tmp_path):
    """The production state backend: the same watermarked windowed agg
    under RocksDBStateStoreProvider (state off-heap/on-disk, the 100 TB
    choice over the default heap-backed provider) must equal the batch
    rollup; the progress metrics prove the provider was active."""
    from datafusion_python_spark.streaming import tumbling_counts
    from datafusion_python_spark.tables import load_table

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = load_table(spark, sf_dir, "events")
        path = str(tmp_path / "rocksdb_src")
        ev.write.mode("overwrite").parquet(path)
        src = spark.readStream.schema(ev.schema).parquet(path)
        out = tumbling_counts(src, window="1 hour", watermark="30 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("rdb")
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        sops = (q.recentProgress[-1] or {}).get("stateOperators", [])
        q.stop()
        assert any(
            k.startswith("rocksdb")
            for s in sops
            for k in (s.get("customMetrics") or {})
        ), "RocksDB provider was not active"
        got = spark.table("rdb").count()
        want = ev.select(
            F.window(F.col("ts").cast("timestamp"), "1 hour"), "event_type"
        ).distinct().count()
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_media_features(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 32
    assert all(f.feat_dim == 16 and len(f.feature) == 16 for f in feats)
    # deterministic: same payload → same feature
    again = extract_features(synthetic_media(spark, n=32), dim=16).collect()
    assert [f.feature for f in feats] == [f.feature for f in again]


def test_media_decoder_stub_raises(spark):
    media = synthetic_media(spark, n=2)
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, decoder="pil")


def test_frame_sample_and_resize(spark):
    media = synthetic_media(spark, n=8, kind="video")
    frames = frame_sample(media, every_n=2)
    rows = frames.collect()
    assert all(r.frame_no % 2 == 0 for r in rows)
    geom = resize_meta(media, max_side=32).collect()
    assert all(r.dst_w <= 32 and r.dst_h <= 32 for r in geom)


def test_probe_media_real_headers(spark):
    import io
    import struct
    import wave

    from datafusion_python_spark.operators.multimodal import MEDIA_SCHEMA, probe_media

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 8
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 1080, 1920)
        + b"\x00" * 12
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 2 * 1000)  # 1000 stereo 16-bit frames
    wav = buf.getvalue()

    rows = [
        (0, "image", bytearray(png), None),
        (1, "image", bytearray(gif), None),
        (2, "image", bytearray(bmp), None),
        (3, "image", bytearray(jpeg), None),
        (4, "audio", bytearray(wav), None),
        (5, "image", bytearray(b"garbage-bytes-here"), None),
        (6, "image", None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in probe_media(df).collect()}
    assert (out[0]["format"], out[0]["width"], out[0]["height"]) == ("png", 640, 480)
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("gif", 320, 200)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("bmp", 800, 600)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == ("jpeg", 1920, 1080)
    assert (out[4]["format"], out[4]["sample_rate"], out[4]["channels"]) == (
        "wav",
        16000,
        2,
    )
    assert out[4]["n_samples"] == 1000
    assert out[5]["format"] is None
    assert out[6]["format"] is None and out[6]["payload_bytes"] == 0


def test_windowed_approx_distinct_stream(spark, events_stream, sf_dir):
    from datafusion_python_spark.streaming import windowed_approx_distinct

    out = windowed_approx_distinct(events_stream, window="1 day")
    _run_to_memory(out, "wad")
    rows = spark.sql("SELECT * FROM wad").collect()
    assert rows
    # estimates must track the exact per-(window, key) distincts computed
    # in batch over the same data (cardinalities << 2^12 registers)
    batch = load_table(spark, sf_dir, "events")
    exact = {
        (r["d"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.date_trunc("day", "ts").alias("d"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        e = exact[(r["window_start"], r["event_type"])]
        assert abs(r["approx_distinct"] - e) <= max(1, 0.05 * e)
    # sketches remain mergeable downstream: global estimate within 5%
    from datafusion_python_spark.operators.sketches import hll_estimate, hll_merge

    merged = hll_merge(spark.table("wad"), [], "hll_sketch").select(
        hll_estimate("hll_sketch").alias("e")
    )
    total_exact = batch.select("user_id").distinct().count()
    assert abs(merged.first()["e"] - total_exact) <= max(1, 0.05 * total_exact)


def test_stream_late_drop_evicts_by_watermark(spark):
    # the gate's correctness is oracle-checked by the driver; here we
    # pin the MECHANISM: the state store must report the planted late
    # row as dropped by the watermark, not merely absent from output.
    import datafusion_python_spark.suite_streaming as ss

    out = ss.stream_late_drop(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    dropped = sum(
        int(op.get("numRowsDroppedByWatermark", 0) or 0)
        for p in ss.LAST_DRAIN_PROGRESS
        for op in (p.get("stateOperators") or [])
    )
    assert dropped == 1


def test_streaming_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    # Kill a watermarked windowed aggregation mid-replay, restart it
    # from the same checkpoint, and require the resumed run to land on
    # EXACTLY the batch answer — no lost windows, no duplicates. This
    # is the operational contract (preempt/upgrade/resume) that makes
    # the streaming ingest safe at scale.
    import os
    import shutil
    import time
    from datetime import timedelta

    from datafusion_python_spark.streaming import (
        start_resumable_parquet_sink,
        tumbling_counts,
    )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = load_table(spark, sf_dir, "events")
        mx = ev.agg(F.max("ts").alias("m")).first()["m"]
        sentinel = spark.createDataFrame(
            [(-1, mx + timedelta(hours=3), -1, "__sentinel__", 0.0, "")], ev.schema
        )
        src_dir = str(tmp_path / "in")
        os.makedirs(src_dir)
        half = ev.count() // 2
        parts = [
            ev.orderBy("event_id").limit(half),
            ev.orderBy("event_id").offset(half),
            sentinel,
        ]
        for i, part in enumerate(parts):
            tmp = str(tmp_path / f"t{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            f = next(x for x in sorted(os.listdir(tmp)) if x.endswith(".parquet"))
            dst = os.path.join(src_dir, f"b{i}.parquet")
            shutil.copy(os.path.join(tmp, f), dst)
            os.utime(dst, (1_000_000_000 + 60 * i,) * 2)

        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def q_from(src):
            agg = tumbling_counts(src, window="1 hour", watermark="10 minutes")
            return agg.select(
                F.col("window_start").cast("timestamp_ntz").alias("hb"),
                "event_type",
                "n",
            )

        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = start_resumable_parquet_sink(q_from(src), out_dir, ckpt)
        # kill after at least one committed micro-batch
        deadline = time.time() + 60
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        assert q.recentProgress, "no batch committed before deadline"
        q.stop()

        # resume from the same checkpoint; drain the rest
        src2 = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q2 = start_resumable_parquet_sink(q_from(src2), out_dir, ckpt)
        q2.processAllAvailable()
        q2.stop()

        got = (
            spark.read.parquet(out_dir)
            .filter(F.col("event_type") != "__sentinel__")
            .groupBy("hb", "event_type")
            .agg(F.sum("n").alias("n"))  # duplicates would inflate n
            .collect()
        )
        want = {
            (r.hb, r.event_type): r.n
            for r in ev.groupBy(
                F.date_trunc("hour", "ts").alias("hb"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert {(r.hb, r.event_type): r.n for r in got} == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
