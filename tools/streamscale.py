"""Streaming at scale: 20M Spark-generated events driven through
Structured Streaming in ~20 micro-batches (file source, 40 parquet
files, maxFilesPerTrigger=2, availableNow), certifying what the 100k-row
streaming gates cannot:

  1. windowed_agg   — tumbling 1h count+sum in COMPLETE mode; the final
                      memory-sink table must equal the batch aggregation
                      EXACTLY (integer cents keep sums exact), and the
                      state operator must hold only ~#windows rows (the
                      state is bounded by key cardinality, not input).
  2. rocksdb_dedup  — dropDuplicates over 20M events with 10% planted
                      duplicate event_ids under RocksDBStateStoreProvider
                      (the production disk-backed state store): the sum
                      of numOutputRows across batches must be exactly
                      the 18M planted-distinct count, with ~18M keys in
                      state — real state pressure, off-heap. (Unbounded
                      exact dedup is the HONEST semantics here; the
                      bounded-state 100 TB variant is
                      dropDuplicatesWithinWatermark, gated separately at
                      sf0.01 as stream_dedup_distinct.)
  3. interval_join(+_full) — watermarked LEFT-OUTER and FULL-OUTER
                      stream-stream interval joins
                      (streaming/dedup_join.py) over time-sliced files:
                      per 4 left rows, 3 have a planted right match
                      within the 5-minute range and 1 has none, and L/8
                      right-only rows (keys with no left partner) plant
                      the full-outer right-null class — so all three
                      emission classes are closed-form (matched 3L/4,
                      left-null L/4, right-null L/8 in full mode / 0 in
                      left mode); a sentinel batch pushes both
                      watermarks past every real row's range so the
                      final no-data batch flushes all null emissions,
                      and END-OF-RUN state must be exactly the 2
                      sentinel rows — eviction measured, not assumed.

Ground truth is planted at generation time (per 10-row cell, row b+9
reuses row b's event_id), so both checks are closed-form — no oracle
engine needed at this size.

Usage: python tools/streamscale.py [n_events] [--fresh]
Writes STREAMSCALE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.session import get_spark

WORK = "/tmp/streamscale"
N_FILES = 40
EPOCH = 1_700_000_000  # fixed start; 30-day event-time spread


def build(spark, n: int) -> str:
    out = f"{WORK}/n{n}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    r = spark.range(n).withColumnRenamed("id", "i")
    pos = F.pmod(F.col("i"), F.lit(10))
    event_id = F.when(pos == 9, F.col("i") - F.lit(9)).otherwise(F.col("i"))
    ts = F.timestamp_seconds(
        F.lit(EPOCH) + F.pmod(F.xxhash64(F.col("i"), F.lit(3)), F.lit(30 * 24 * 3600))
    )
    cents = F.pmod(F.xxhash64(F.col("i"), F.lit(4)), F.lit(100_000))
    (
        r.select(
            event_id.alias("event_id"),
            ts.alias("ts"),
            cents.alias("cents"),
        )
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    open(f"{out}/_DONE", "w").close()
    return out


def build_join(spark, n: int) -> tuple[str, int]:
    """Two-sided corpus for the stream-stream interval joins, planted:
    L = n/2 left rows with monotone event times over 30 days; left row i
    gets a right-side match at ts + [1, 300] s iff i % 4 != 3, and L/8
    extra RIGHT-ONLY rows (keys >= L, no left partner, same 30-day
    spread) plant the full-outer right-null class. Files are TIME-SLICED
    (one per 18 h of event time, mtime-ordered) so the watermark never
    drops an in-order row, plus a final sentinel file (one row per side
    at max ts + 3 h, keys -1/-2) that pushes both sides' watermarks past
    every real row's join range."""
    L = (n // 8) * 4  # left rows, divisible by 8; right side adds 3L/4
    # v2: the corpus layout is versioned in the path so a cached _DONE
    # from an older generator (without the right-only class) can't leak
    # into a run of the new closed forms
    out = f"{WORK}/join{n}_v2"
    stream_dir = f"{out}/in"
    if os.path.exists(f"{out}/_DONE"):
        return out, L
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(stream_dir)
    span = 30 * 24 * 3600
    r = spark.range(L).withColumnRenamed("id", "i")
    lsec = F.lit(EPOCH) + (F.col("i") * span / F.lit(L)).cast("long")
    left = r.select(
        F.col("i").alias("k"),
        F.lit("L").alias("side"),
        F.timestamp_seconds(lsec).alias("ts"),
    )
    rsec = lsec + F.pmod(F.xxhash64("i", F.lit(8)), F.lit(300)) + 1
    right = r.filter(F.pmod(F.col("i"), F.lit(4)) != 3).select(
        F.col("i").alias("k"),
        F.lit("R").alias("side"),
        F.timestamp_seconds(rsec).alias("ts"),
    )
    ro = spark.range(L // 8).withColumnRenamed("id", "j")
    rosec = F.lit(EPOCH) + (F.col("j") * span / F.lit(L // 8)).cast("long")
    right_only = ro.select(
        (F.col("j") + F.lit(L)).alias("k"),
        F.lit("R").alias("side"),
        F.timestamp_seconds(rosec).alias("ts"),
    )
    slice_s = span // N_FILES  # 18 h of event time per file
    fid = F.least(
        F.lit(N_FILES - 1),
        ((F.unix_timestamp("ts") - F.lit(EPOCH)) / F.lit(slice_s)).cast("int"),
    )
    tmp = f"{out}/tmp"
    (
        left.unionByName(right)
        .unionByName(right_only)
        .withColumn("fid", fid)
        .repartition(N_FILES, "fid")  # one part file per fid directory
        .write.partitionBy("fid")
        .mode("overwrite")
        .parquet(tmp)
    )
    mtime = 1_000_000_000
    for f in range(N_FILES):
        fdir = f"{tmp}/fid={f}"
        part = next(p for p in sorted(os.listdir(fdir)) if p.endswith(".parquet"))
        dst = f"{stream_dir}/b{f:02d}.parquet"
        shutil.copy(f"{fdir}/{part}", dst)
        os.utime(dst, (mtime + 60 * f, mtime + 60 * f))
    sent_sec = EPOCH + span + 3 * 3600
    sent = spark.createDataFrame(
        [(-1, "L", sent_sec), (-2, "R", sent_sec)], "k long, side string, sec long"
    ).select("k", "side", F.timestamp_seconds("sec").alias("ts"))
    sent.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/sent")
    part = next(
        p for p in sorted(os.listdir(f"{tmp}/sent")) if p.endswith(".parquet")
    )
    dst = f"{stream_dir}/b{N_FILES:02d}.parquet"
    shutil.copy(f"{tmp}/sent/{part}", dst)
    os.utime(dst, (mtime + 60 * N_FILES, mtime + 60 * N_FILES))
    shutil.rmtree(tmp, ignore_errors=True)
    open(f"{out}/_DONE", "w").close()
    return out, L


def run_join(spark, n: int) -> dict:
    from datafusion_python_spark.streaming.dedup_join import interval_join_streams

    d, L = build_join(spark, n)
    schema = spark.read.parquet(f"{d}/in/b00.parquet").schema
    n_in = L + L * 3 // 4 + L // 8 + 2
    res: dict[str, dict] = {}

    for how, tag in (("left_outer", "interval_join"), ("full_outer", "interval_join_full")):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(f"{d}/in")
        )
        joined = interval_join_streams(
            src.filter(F.col("side") == "L").select("k", "ts"),
            src.filter(F.col("side") == "R").select("k", "ts"),
            key="k",
            watermark="10 minutes",
            max_delay="5 minutes",
            how=how,
        )
        counts = {"matched": 0, "left_only": 0, "right_only": 0}

        def fb(bdf, _bid, counts=counts):
            row = bdf.filter(F.col("k") >= 0).agg(
                F.count(
                    F.when(F.col("ts").isNotNull() & F.col("r_ts").isNotNull(), 1)
                ).alias("m"),
                F.count(F.when(F.col("r_ts").isNull(), 1)).alias("lo"),
                F.count(F.when(F.col("ts").isNull(), 1)).alias("ro"),
            ).first()
            counts["matched"] += row["m"]
            counts["left_only"] += row["lo"]
            counts["right_only"] += row["ro"]

        ckpt = f"{WORK}/ckpt_{tag}_{n}"
        shutil.rmtree(ckpt, ignore_errors=True)
        q = (
            joined.writeStream.foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        wall, progress = _drain(q)
        batches = [p for p in progress if p and p["numInputRows"] > 0]
        max_state = max(
            (s["numRowsTotal"] for p in progress for s in p.get("stateOperators", [])),
            default=0,
        )
        final_state = next(
            (
                s["numRowsTotal"]
                for p in reversed(progress)
                for s in p.get("stateOperators", [])
            ),
            None,
        )
        want_ro = L // 8 if how == "full_outer" else 0
        ok = (
            counts["matched"] == L * 3 // 4
            and counts["left_only"] == L // 4
            and counts["right_only"] == want_ro
            and final_state == 2  # only the 2 sentinel rows outlive eviction
            and max_state < 0.2 * n_in  # bounded by slice horizon, not n
        )
        res[tag] = {
            "sec": round(wall, 2),
            "rows_per_s": int(n_in / wall),
            "micro_batches": len(batches),
            "state_rows": max_state,
            "verify": f"{how}: matched {counts['matched']} == 3L/4, "
            f"left-null {counts['left_only']} == L/4, right-null "
            f"{counts['right_only']} == {'L/8 (planted right-only keys)' if want_ro else '0'}; "
            f"end-of-run state {final_state} rows == the 2 sentinels "
            f"(all real rows evicted); peak state {max_state:,} ≪ "
            f"{n_in:,} input rows",
            "ok": ok,
        }
    return res


def _drain(q) -> tuple[float, list]:
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    return wall, list(q.recentProgress)


def _src(spark, d, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(f"{d}/events.parquet")
    )


def run(spark, n: int) -> dict:
    d = build(spark, n)
    batch = spark.read.parquet(f"{d}/events.parquet")
    schema = batch.schema
    res: dict[str, dict] = {}

    # ---- 1. windowed aggregation, COMPLETE mode, exact batch equality
    agg = (
        _src(spark, d, schema)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
    )
    ckpt = f"{WORK}/ckpt_agg_{n}"
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        agg.writeStream.format("memory")
        .queryName("xl_windowed")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    wall, progress = _drain(q)
    got = sorted(
        (r["w"]["start"], r["n"], r["cents"])
        for r in spark.table("xl_windowed").collect()
    )
    want = sorted(
        (r["w"]["start"], r["n"], r["cents"])
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("cents").alias("cents"))
        .collect()
    )
    batches = [p for p in progress if p and p["numInputRows"] > 0]
    state_rows = max(
        (s["numRowsTotal"] for p in batches for s in p.get("stateOperators", [])),
        default=0,
    )
    res["windowed_agg"] = {
        "sec": round(wall, 2),
        "rows_per_s": int(n / wall),
        "micro_batches": len(batches),
        "state_rows": state_rows,
        "verify": f"streaming == batch on {len(want)} hourly windows "
        f"(count+sum exact); state {state_rows} rows == #windows",
        "ok": got == want and state_rows == len(want),
    }

    # ---- 2. RocksDB-backed exact dedup, planted distinct count
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ckpt = f"{WORK}/ckpt_dedup_{n}"
        shutil.rmtree(ckpt, ignore_errors=True)
        dd = _src(spark, d, schema).dropDuplicates(["event_id"])
        q = (
            dd.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        wall, progress = _drain(q)
        batches = [p for p in progress if p and p["numInputRows"] > 0]
        out_rows = sum(int(p["sink"]["numOutputRows"]) for p in batches)
        state_rows = max(
            (s["numRowsTotal"] for p in batches for s in p.get("stateOperators", [])),
            default=0,
        )
        rocks = any(
            k.startswith("rocksdb")
            for p in batches
            for s in p.get("stateOperators", [])
            for k in (s.get("customMetrics") or {})
        )
        expected = n - n // 10
        res["rocksdb_dedup"] = {
            "sec": round(wall, 2),
            "rows_per_s": int(n / wall),
            "micro_batches": len(batches),
            "state_rows": state_rows,
            "verify": f"first-seen output {out_rows} == planted distinct "
            f"({expected}); {state_rows} keys in RocksDB state "
            f"(provider active: {rocks})",
            "ok": out_rows == expected and state_rows == expected and rocks,
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    # ---- 3. watermarked left-outer stream-stream interval join
    res.update(run_join(spark, n))
    return res


def main() -> None:
    n = 20_000_000
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n = int(args[0])
    if "--fresh" in sys.argv:
        shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark("streamscale")
    spark.sparkContext.setLogLevel("ERROR")
    res = run(spark, n)
    print(json.dumps({"metric": "streamscale", "n_events": n, "ops": res}), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = [
        f"# STREAMSCALE — Structured Streaming over {n:,} events, planted ground truth",
        "",
        "File-source stream (40 Spark-generated parquet files, "
        "maxFilesPerTrigger=2, availableNow trigger → ~20 micro-batches; "
        "tools/streamscale.py). Event times spread over 30 days; per "
        "10-row cell one event reuses the cell's event_id, so the "
        "distinct count is closed-form. This extends the 100k-row "
        "streaming gates (SHUFFLEAUDIT) by 200× and puts the RocksDB "
        "state backend under real multi-million-key pressure.",
        "",
        "| query | sec | events/s | batches | state rows | verification | ok |",
        "|---|---|---|---|---|---|---|",
    ]
    for op, r in res.items():
        lines.append(
            f"| {op} | {r['sec']} | {r['rows_per_s']:,} | "
            f"{r['micro_batches']} | {r['state_rows']:,} | {r['verify']} | "
            f"{'PASS' if r['ok'] else '**FAIL**'} |"
        )
    lines += [
        "",
        "windowed_agg's state is bounded by WINDOW CARDINALITY (720 hourly "
        "windows for 30 days), not by input volume — the 100 TB shape: "
        "20M rows in, ~720 state rows held. rocksdb_dedup is the opposite, "
        "deliberate extreme: exact first-seen dedup must retain every "
        "distinct key, so state grows to the distinct count (18M keys "
        "here) and the production answer is the disk-backed RocksDB "
        "provider measured above (the heap provider would hold all keys "
        "on-heap); when event-time bounds apply, "
        "dropDuplicatesWithinWatermark (gated as stream_dedup_distinct) "
        "caps state by the watermark horizon instead.",
        "",
        "interval_join / interval_join_full stream TWO sides (left = n/2 "
        "rows; right = 3/8·n planted matches within the 5-minute join "
        "range + n/16 right-only keys with no left partner) from "
        "time-sliced files — 18 h of event time per file, so in-order "
        "arrival and the 10-minute watermark never drops a real row — "
        "through the left-outer and full-outer watermarked interval "
        "joins the sf0.01 gates certify at 100k rows "
        "(streaming/dedup_join.py). All three emission classes are "
        "planted closed-form (3 matched + 1 null-right per 4 left rows; "
        "the right-only keys emit as null-left exactly once in full mode "
        "and never in left mode), and eviction is MEASURED: after the "
        "sentinel batch advances both watermarks past every real row's "
        "range, the no-data batch must flush the last null emissions and "
        "leave exactly the 2 sentinel rows in state — symmetric join "
        "state is bounded by the watermark horizon (peak ≈ one trigger's "
        "two 18 h slices + one batch of eviction lag), never by stream "
        "length.",
        "",
    ]
    with open(os.path.join(root, "STREAMSCALE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote STREAMSCALE.md")


if __name__ == "__main__":
    main()
