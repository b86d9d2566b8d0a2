"""Structured Streaming gate queries: the streaming module on the
DRIVER's correctness record, not just under pytest.

Each gate replays the bounded events table as a file stream (one
parquet directory, one micro-batch), drives a streaming/*.py helper —
watermarked tumbling windows, bounded-state dedup, session windows —
through a memory sink to completion, and returns the drained table.
Over a single replayed batch the streaming semantics coincide with the
batch semantics (no row is ever later than the watermark), so each
query has an ordinary SQL oracle: the gate certifies that the
STREAMING implementation (state store, watermark plumbing, event-time
windows) produces exactly the batch answer on in-order data — the
invariant that makes the lambda-free "one pipeline for backfill and
live" design sound. Late-data DROP (watermark eviction) is gated too:
``stream_late_drop`` pins arrival order with one file per micro-batch
(``maxFilesPerTrigger=1``, increasing mtimes), so "the batch answer
minus exactly the planted late row" is a well-defined SQL oracle; the
messier multi-late-row orderings stay in
tests/test_streaming_multimodal.py.

Scale notes: the file source shards by file at 100 TB; windowed/dedup
state is partitioned by (key, window) across executors and evicted by
the watermark, so state is bounded by live windows / in-flight keys,
never by history.
"""

from __future__ import annotations

import atexit
import functools
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

_SEQ = itertools.count()

# Per-pid /tmp replay dirs this process created; removed at interpreter
# exit (every gate drains its stream synchronously, so nothing reads
# them after the gate returns — without this each driver run leaked a
# full events-table copy per pid under tempfile.gettempdir()).
_TMP_DIRS: set[str] = set()


def _track_tmp(path: str) -> str:
    if not _TMP_DIRS:
        atexit.register(_cleanup_tmp)
    _TMP_DIRS.add(path)
    return path


def _cleanup_tmp() -> None:
    for p in list(_TMP_DIRS):
        shutil.rmtree(p, ignore_errors=True)
        _TMP_DIRS.discard(p)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _with_utc(fn):
    """Run a gate with the session timeZone pinned to UTC, then restore.

    The NTZ→TIMESTAMP→NTZ round-trips these gates do are exact only in
    a fixed-offset zone, but a gate must not leak the pinned conf into
    whatever the (shared) session runs next. Casts capture their zone
    at ANALYSIS time (ResolveTimeZone stamps timeZoneId into the
    expression), so forcing ``out.schema`` inside the UTC scope makes
    the returned lazy DataFrame — and anything later built on top of
    its analyzed plan — execute under UTC even after the conf is
    restored (verified empirically: a post-restore collect matches the
    UTC value while a freshly analyzed plan does not).
    """

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        prev = spark.conf.get("spark.sql.session.timeZone", None)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            out = fn(spark, sf_dir)
            out.schema  # stamp UTC into the plan's casts now
            return out
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.session.timeZone")
            else:
                spark.conf.set("spark.sql.session.timeZone", prev)

    return wrapped


def _replay_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded file stream (deterministic replay).

    Callers hold the UTC pin via ``_with_utc``. The replay path carries
    the pid so concurrent runs over the same sf_dir don't overwrite
    each other mid-read (same token scheme as ``_drain``'s sink name).
    """
    ev = _t(spark, sf_dir, "events")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = _track_tmp(
        os.path.join(
            tempfile.gettempdir(), f"_suite_stream_events_{tag}_{os.getpid()}"
        )
    )
    ev.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(ev.schema).parquet(path)


# Progress of the most recent _drain run (one entry per micro-batch,
# the StreamingQueryProgress dicts). tools/shuffle_audit.py reads this
# after driving a gate to report state-store rows/bytes and
# watermark-dropped counts — the streaming analogue of the batch
# gates' SQLMetrics walk.
LAST_DRAIN_PROGRESS: list[dict] = []


def _drain(spark: SparkSession, sdf: DataFrame, mode: str) -> DataFrame:
    """Run the streaming query to completion into a memory sink and
    return the drained table (unique name per call, bounded replay)."""
    global LAST_DRAIN_PROGRESS
    name = f"suite_stream_{os.getpid()}_{next(_SEQ)}"
    q = sdf.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    LAST_DRAIN_PROGRESS = list(q.recentProgress)
    q.stop()
    return spark.table(name)


@_with_utc
def stream_hourly_counts(spark, sf_dir):
    """Watermarked tumbling 1-hour windows per event_type over the
    replayed stream (streaming/windows.py tumbling_counts). Window
    starts align to epoch hours = date_trunc('hour'), so the oracle is
    the plain batch rollup; the instant-typed window start casts back
    to TIMESTAMP_NTZ exactly under the pinned UTC session."""
    from .streaming import tumbling_counts

    src = _replay_events(spark, sf_dir)
    out = tumbling_counts(src, window="1 hour", watermark="30 minutes")
    res = _drain(spark, out, "complete")
    return res.select(
        F.col("window_start").cast("timestamp_ntz").alias("hour_bucket"),
        "event_type",
        F.col("n").alias("n_events"),
        F.round("total_value", 2).alias("sum_value"),
    ).orderBy("hour_bucket", "event_type")


STREAM_HOURLY_COUNTS_SQL = """
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@_with_utc
def stream_dedup_distinct(spark, sf_dir):
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark on
    (user_id, event_type)) chained into a streaming aggregation — the
    standard composition that replaces the unsupported streaming
    count(DISTINCT). The count per type is order-independent, so the
    oracle is exactly count(DISTINCT user_id)."""
    from .streaming import dedup_stream

    src = _replay_events(spark, sf_dir)
    dd = dedup_stream(src, ["user_id", "event_type"], watermark="1 hour")
    out = dd.groupBy("event_type").agg(F.count("*").alias("n_distinct_users"))
    res = _drain(spark, out, "complete")
    return res.orderBy("event_type")


STREAM_DEDUP_DISTINCT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type ORDER BY event_type
"""


@_with_utc
def stream_session_stats(spark, sf_dir):
    """Streaming session windows (20-minute gap) per user
    (streaming/windows.py sessionized_counts). The oracle re-derives
    gap-based sessions with the gaps-and-islands idiom; session_end is
    last event + gap, per Spark's session_window contract."""
    from .streaming import sessionized_counts

    src = _replay_events(spark, sf_dir)
    out = sessionized_counts(src, gap="20 minutes", watermark="1 hour")
    res = _drain(spark, out, "complete")
    return res.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    ).orderBy("user_id", "session_start")


STREAM_SESSION_STATS_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1200000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 20 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@_with_utc
def stream_stateful_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals with explicit state. One replayed batch leaves each
    user's final state = the batch aggregate, so the oracle is the
    plain GROUP BY; values are 2-decimal so round(total, 2) is exact
    regardless of pandas' pairwise summation order."""
    from .streaming import running_total_per_key

    src = _replay_events(spark, sf_dir)
    out = running_total_per_key(src, key_col="user_id")
    res = _drain(spark, out, "update")
    return res.select(
        "user_id",
        F.round("total_value", 2).alias("total_value"),
        "n_events",
    ).orderBy("user_id")


STREAM_STATEFUL_TOTALS_SQL = """
SELECT user_id, round(sum(value), 2) AS total_value,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


@_with_utc
def stream_interval_join(spark, sf_dir):
    """Watermarked stream-stream interval join: purchases within 5
    minutes after a click by the same user, both sides replayed from
    the same bounded stream. Join state purges past watermark + range
    in live operation; over one in-order batch the result equals the
    batch interval join, which is the oracle. The joined rows drain to
    the sink (append mode) and are aggregated per user as a batch."""
    from .streaming import interval_join_streams

    src = _replay_events(spark, sf_dir)
    clicks = src.filter(F.col("event_type") == "click")
    # the helper renames+drops the right event-time col; carry the
    # purchase time as a plain NTZ payload copy (made BEFORE the helper
    # casts/watermarks, so there's no second event-time column)
    purchases = src.filter(F.col("event_type") == "purchase").withColumn(
        "purchase_ts", F.col("ts")
    )
    joined = interval_join_streams(
        clicks, purchases, key="user_id", watermark="1 hour", max_delay="5 minutes"
    )
    res = _drain(spark, joined, "append")
    return (
        res.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.col("ts").cast("timestamp_ntz")).alias("first_click"),
            F.max("r_purchase_ts").alias("last_purchase"),
        )
        .orderBy("user_id")
    )


STREAM_INTERVAL_JOIN_SQL = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT l.user_id, count(*) AS n_pairs,
       min(l.ts) AS first_click, max(r.ts) AS last_purchase
FROM l JOIN r ON l.user_id = r.user_id
 AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
GROUP BY l.user_id ORDER BY l.user_id
"""


@_with_utc
def stream_late_drop(spark, sf_dir):
    """Watermark EVICTION on the driver record: a ≥2-micro-batch replay
    with a planted late row that the state store must drop.

    Batch 1 = every event except the globally earliest row (one file,
    in-order); batch 2 = a watermark CARRIER sentinel at max(ts)+1 s —
    needed because Spark's late-event filter runs one batch behind
    eviction (StateStoreSave carries two watermarks; the late filter
    uses the PREVIOUS batch's committed value, so a late row arriving
    in the first batch after the bulk would still sneak in); batch 3 =
    the earliest row alone — its filter watermark is now max(ts) −
    10 min, hours past the row's 1-hour window, so the state store
    discards it (numRowsDroppedByWatermark = 1); batch 4 = a second
    sentinel 3 h past the corpus that pushes the final watermark over
    every real window so append mode emits them all. Sentinel groups
    key on event_type '__sentinel__' and are filtered from the output;
    their own windows never finalize. Arrival order is pinned: one
    file per batch (``maxFilesPerTrigger=1``) with strictly increasing
    mtimes. The oracle is therefore plain SQL — the batch hourly
    rollup minus exactly that one row."""
    from .streaming import tumbling_counts

    ev = _t(spark, sf_dir, "events")
    first = ev.orderBy("ts", "event_id").limit(1)
    rest = ev.join(first.select("event_id"), "event_id", "left_anti")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    from datetime import timedelta

    carrier = spark.createDataFrame(
        [(-2, mx + timedelta(seconds=1), -1, "__sentinel__", 0.0, "")], ev.schema
    )
    sentinel = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), -1, "__sentinel__", 0.0, "")], ev.schema
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = _track_tmp(
        os.path.join(
            tempfile.gettempdir(), f"_suite_stream_late_{tag}_{os.getpid()}"
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    stream_dir = os.path.join(base, "in")
    os.makedirs(stream_dir)
    mtime = 1_000_000_000
    for i, batch in enumerate([rest, carrier, first, sentinel]):
        tmp = os.path.join(base, f"tmp{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime + 60 * i, mtime + 60 * i))

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = tumbling_counts(src, window="1 hour", watermark="10 minutes")
    res = _drain(spark, out, "append")
    return (
        res.filter(F.col("event_type") != "__sentinel__")
        .select(
            F.col("window_start").cast("timestamp_ntz").alias("hour_bucket"),
            "event_type",
            F.col("n").alias("n_events"),
            F.round("total_value", 2).alias("sum_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


@_with_utc
def stream_outer_join(spark, sf_dir):
    """Watermarked LEFT-OUTER stream-stream interval join on the driver
    record: clicks left-joined to purchases within 5 minutes by the
    same user; a click with no qualifying purchase emits with NULL
    right columns — but only after the watermark passes its entire
    join range (ts + 5 min), the one streaming join semantics not
    previously gated (``stream_interval_join`` covers INNER).

    Replay shape (the ``stream_late_drop`` pattern): batch 1 = every
    real event, one in-order file; batch 2 = one sentinel click + one
    sentinel purchase at max(ts) + 3 h (user_id −1, same timestamp so
    the strict ``>`` bound keeps them from pairing) that push BOTH
    sides' watermarks hours past every real row's range. Null emission
    runs one batch behind the watermark (state eviction in
    StateStoreSave uses the PREVIOUS batch's committed watermark), so
    the final unmatched rows surface in the no-data batch Spark
    triggers after the sentinel batch — ``processAllAvailable`` blocks
    until that batch commits (the same machinery ``stream_late_drop``'s
    final-window emission relies on). The sentinel click itself stays
    in state forever (nothing outlives ITS range) and is filtered by
    user_id. Over this bounded in-order replay the result equals the
    batch LEFT JOIN, which is the oracle."""
    from datetime import timedelta

    from .streaming import interval_join_streams

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    sent = spark.createDataFrame(
        [
            (-2, mx + timedelta(hours=3), -1, "click", 0.0, ""),
            (-1, mx + timedelta(hours=3), -1, "purchase", 0.0, ""),
        ],
        ev.schema,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = _track_tmp(
        os.path.join(
            tempfile.gettempdir(), f"_suite_stream_outer_{tag}_{os.getpid()}"
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    stream_dir = os.path.join(base, "in")
    os.makedirs(stream_dir)
    mtime = 1_000_000_000
    for i, batch in enumerate([ev, sent]):
        tmp = os.path.join(base, f"tmp{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime + 60 * i, mtime + 60 * i))

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(F.col("event_type") == "purchase").withColumn(
        "purchase_ts", F.col("ts")
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        key="user_id",
        watermark="1 hour",
        max_delay="5 minutes",
        how="left_outer",
    )
    res = _drain(spark, joined, "append")
    return (
        res.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("r_purchase_ts").alias("n_pairs"),
            (F.count("*") - F.count("r_purchase_ts")).alias("n_unmatched"),
            F.max("r_purchase_ts").alias("last_purchase"),
        )
        .orderBy("user_id")
    )


@_with_utc
def stream_full_outer_join(spark, sf_dir):
    """Watermarked FULL-OUTER stream-stream interval join: both sides'
    unmatched rows emit with NULLs after the watermark passes their
    join range. Same replay shape as ``stream_outer_join`` (sentinel
    click + purchase at max(ts)+3 h advance both watermarks; the
    no-data batch flushes the final evictions); the helper coalesces
    the key across sides so right-only rows keep their user_id. Oracle
    = the batch FULL JOIN."""
    from datetime import timedelta

    from .streaming import interval_join_streams

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    sent = spark.createDataFrame(
        [
            (-2, mx + timedelta(hours=3), -1, "click", 0.0, ""),
            (-1, mx + timedelta(hours=3), -1, "purchase", 0.0, ""),
        ],
        ev.schema,
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = _track_tmp(
        os.path.join(
            tempfile.gettempdir(), f"_suite_stream_fouter_{tag}_{os.getpid()}"
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    stream_dir = os.path.join(base, "in")
    os.makedirs(stream_dir)
    mtime = 1_000_000_000
    for i, batch in enumerate([ev, sent]):
        tmp = os.path.join(base, f"tmp{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime + 60 * i, mtime + 60 * i))

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    clicks = src.filter(F.col("event_type") == "click").withColumn(
        "click_ts", F.col("ts")
    )
    purchases = src.filter(F.col("event_type") == "purchase").withColumn(
        "purchase_ts", F.col("ts")
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        key="user_id",
        watermark="1 hour",
        max_delay="5 minutes",
        how="full_outer",
    )
    res = _drain(spark, joined, "append")
    matched = F.col("click_ts").isNotNull() & F.col("r_purchase_ts").isNotNull()
    return (
        res.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count(F.when(matched, 1)).alias("n_pairs"),
            F.count(F.when(F.col("r_purchase_ts").isNull(), 1)).alias("left_only"),
            F.count(F.when(F.col("click_ts").isNull(), 1)).alias("right_only"),
            F.max("r_purchase_ts").alias("last_purchase"),
        )
        .orderBy("user_id")
    )


STREAM_FULL_OUTER_JOIN_SQL = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT coalesce(l.user_id, r.user_id) AS user_id,
       count(*) AS n_rows,
       count(CASE WHEN l.ts IS NOT NULL AND r.ts IS NOT NULL THEN 1 END) AS n_pairs,
       count(CASE WHEN r.ts IS NULL THEN 1 END) AS left_only,
       count(CASE WHEN l.ts IS NULL THEN 1 END) AS right_only,
       max(r.ts) AS last_purchase
FROM l FULL JOIN r ON l.user_id = r.user_id
 AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
GROUP BY 1 ORDER BY 1
"""


STREAM_OUTER_JOIN_SQL = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT l.user_id, count(*) AS n_rows,
       count(r.ts) AS n_pairs,
       count(*) - count(r.ts) AS n_unmatched,
       max(r.ts) AS last_purchase
FROM l LEFT JOIN r ON l.user_id = r.user_id
 AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
GROUP BY l.user_id ORDER BY l.user_id
"""


@_with_utc
def stream_windowed_hll(spark, sf_dir):
    """Streaming windowed approx-distinct (HLL sketch state): the
    standard replacement for the unsupported streaming
    count(DISTINCT) — per-(key, window) state is a fixed register
    array, so the watermark bounds state by live windows, not users.
    The sketch estimate is engine-specific, so the gate follows the
    ``agg_approx`` pattern: emit the EXACT batch count per group
    alongside a tolerance boolean (estimate within 5%, generous for
    lg_k=12's ~1.6% rsd); the oracle recomputes the exact counts and
    expects every flag true."""
    from .streaming import windowed_approx_distinct

    src = _replay_events(spark, sf_dir)
    out = windowed_approx_distinct(src, window="1 hour", watermark="30 minutes")
    res = _drain(spark, out, "complete")
    ev = _t(spark, sf_dir, "events")
    exact = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        "event_type",
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    est = res.select(
        F.col("window_start").cast("timestamp_ntz").alias("hour_bucket"),
        "event_type",
        "approx_distinct",
    )
    return (
        est.join(exact, ["hour_bucket", "event_type"])
        .select(
            "hour_bucket",
            "event_type",
            "n_exact",
            (
                F.abs(F.col("approx_distinct") - F.col("n_exact"))
                / F.col("n_exact")
                < 0.05
            ).alias("hll_ok"),
        )
        .orderBy("hour_bucket", "event_type")
    )


STREAM_WINDOWED_HLL_SQL = """
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@_with_utc
def stream_restart_resume(spark, sf_dir):
    """Checkpoint-restart exactly-once, ON the driver's record: run the
    watermarked hourly rollup over HALF the event files through the
    resumable parquet sink (``availableNow`` — drains what exists, then
    stops), then start a SECOND query from the same checkpoint over the
    full directory. The restarted query resumes from the committed
    offsets and state (the first run's open windows finalize only after
    the second run's files push the watermark past them), so the sink's
    parquet output equals the batch rollup over ALL events exactly —
    a duplicated micro-batch would inflate counts, a lost one would
    drop windows, and either breaks the oracle match. The eviction
    sentinel at max(ts)+3 h forces every real window past the final
    watermark so append mode emits them all (same technique as
    ``stream_late_drop``); sentinel groups are filtered from the
    output. ``availableNow`` makes the stop point DETERMINISTIC (after
    exactly the files present at start), unlike the timing-based kill
    in tests/test_streaming_multimodal.py, which stays the messier
    mid-batch variant."""
    import shutil as _sh

    from .streaming import start_resumable_parquet_sink, tumbling_counts

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    from datetime import timedelta

    sentinel = spark.createDataFrame(
        [(-1, mx + timedelta(hours=3), -1, "__sentinel__", 0.0, "")], ev.schema
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = _track_tmp(
        os.path.join(
            tempfile.gettempdir(), f"_suite_stream_restart_{tag}_{os.getpid()}"
        )
    )
    _sh.rmtree(base, ignore_errors=True)
    stream_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(stream_dir)
    half = ev.count() // 2
    parts = [
        ev.orderBy("event_id").limit(half),
        ev.orderBy("event_id").offset(half),
        sentinel,
    ]
    staged = []
    for i, part in enumerate(parts):
        tmp = os.path.join(base, f"tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = next(x for x in sorted(os.listdir(tmp)) if x.endswith(".parquet"))
        staged.append((os.path.join(tmp, f), os.path.join(stream_dir, f"b{i}.parquet"), i))

    def place(upto: int) -> None:
        for src_f, dst, i in staged:
            if i <= upto and not os.path.exists(dst):
                _sh.copy(src_f, dst)
                os.utime(dst, (1_000_000_000 + 60 * i,) * 2)

    def q_start():
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        agg = tumbling_counts(src, window="1 hour", watermark="10 minutes")
        out = agg.select(
            F.col("window_start").cast("timestamp_ntz").alias("hour_bucket"),
            "event_type",
            "n",
            "total_value",
        )
        return start_resumable_parquet_sink(out, out_dir, ckpt, available_now=True)

    global LAST_DRAIN_PROGRESS
    place(0)  # first half only
    q1 = q_start()
    q1.awaitTermination()
    progress = list(q1.recentProgress)
    place(2)  # second half + eviction sentinel appear "after the crash"
    q2 = q_start()
    q2.awaitTermination()
    LAST_DRAIN_PROGRESS = progress + list(q2.recentProgress)
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            "hour_bucket",
            "event_type",
            F.col("n").alias("n_events"),
            F.round("total_value", 2).alias("sum_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


@_with_utc
def stream_static_enrich(spark, sf_dir):
    """Stream-STATIC broadcast-join enrichment: the live event stream
    decorated with a dimension read as a plain batch table (customer
    market segment), chained into the watermarked hourly rollup — the
    one streaming join form not previously on the record
    (stream-stream interval join is ``stream_interval_join``). Spark
    re-plans the static side per micro-batch, so in production the dim
    can be swapped/updated between batches without restarting the
    query; the broadcast keeps the stream side shuffle-free before the
    windowed aggregate. Over the bounded in-order replay streaming ==
    batch, so the oracle is the plain batch join + rollup."""
    from .streaming import tumbling_counts

    src = _replay_events(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = src.join(F.broadcast(cust), src.user_id == cust.c_custkey)
    out = tumbling_counts(
        enriched, key_col="c_mktsegment", window="1 hour", watermark="30 minutes"
    )
    res = _drain(spark, out, "complete")
    return res.select(
        F.col("window_start").cast("timestamp_ntz").alias("hour_bucket"),
        "c_mktsegment",
        F.col("n").alias("n_events"),
        F.round("total_value", 2).alias("sum_value"),
    ).orderBy("hour_bucket", "c_mktsegment")


STREAM_STATIC_ENRICH_SQL = """
SELECT date_trunc('hour', ts) AS hour_bucket, c_mktsegment,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


STREAM_RESTART_RESUME_SQL = """
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


STREAM_LATE_DROP_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (ORDER BY ts, event_id) AS rn FROM events
)
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM ranked WHERE rn > 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


STREAMING_QUERIES: dict[str, tuple] = {
    "stream_hourly_counts": (stream_hourly_counts, STREAM_HOURLY_COUNTS_SQL),
    "stream_dedup_distinct": (stream_dedup_distinct, STREAM_DEDUP_DISTINCT_SQL),
    "stream_session_stats": (stream_session_stats, STREAM_SESSION_STATS_SQL),
    "stream_stateful_totals": (stream_stateful_totals, STREAM_STATEFUL_TOTALS_SQL),
    "stream_interval_join": (stream_interval_join, STREAM_INTERVAL_JOIN_SQL),
    "stream_outer_join": (stream_outer_join, STREAM_OUTER_JOIN_SQL),
    "stream_full_outer_join": (stream_full_outer_join, STREAM_FULL_OUTER_JOIN_SQL),
    "stream_late_drop": (stream_late_drop, STREAM_LATE_DROP_SQL),
    "stream_windowed_hll": (stream_windowed_hll, STREAM_WINDOWED_HLL_SQL),
    "stream_restart_resume": (stream_restart_resume, STREAM_RESTART_RESUME_SQL),
    "stream_static_enrich": (stream_static_enrich, STREAM_STATIC_ENRICH_SQL),
}
