"""Streaming deduplication and stream-stream joins.

Beyond-parity operators (the reference has no streaming engine) built on
Structured Streaming primitives — these are the streaming halves of the
training-data-pipeline ops in ``operators/dedup.py``:

- exact dedup over an unbounded stream with bounded state
  (``dropDuplicatesWithinWatermark``: state for a key is dropped once the
  watermark passes, so memory is O(keys-per-watermark-window), not O(all
  keys ever) — the property that makes streaming dedup viable at 100 TB/day)
- fingerprint dedup: content hash (md5 of normalized text) as the dedup
  key, same bounded-state mechanics
- watermarked stream-stream inner join with a bounded time range (state
  on both sides is purged past the watermark; the range condition bounds
  how long a row waits for its match)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import ensure_event_time


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup on ``keys`` with bounded state.

    Late duplicates arriving within the watermark are dropped; state for
    a key is reclaimed once the watermark passes its event time.
    """
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def dedup_stream_by_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming content dedup: md5 over whitespace-normalized lowercase
    text (same fingerprint as operators/text.py doc_fingerprint), then
    bounded-state dedup on the fingerprint."""
    fp = F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    tagged = docs.withColumn("__fp", fp)
    return (
        ensure_event_time(tagged, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right rows must fall within
    (left_ts, left_ts + max_delay]. Both state stores are purged past the
    watermark + range bound — join state stays bounded regardless of
    stream length.

    ``how="left_outer"`` emits unmatched LEFT rows with NULL right
    columns — but only once the watermark has passed the row's entire
    join range (left_ts + max_delay), i.e. once no future right row
    could still match; until then the row waits in state. Spark runs
    the eviction in the micro-batch AFTER the watermark advances (the
    no-data batch), so a bounded replay must end with a
    watermark-carrier batch for every unmatched row to emit.
    ``how="right_outer"`` / ``"full_outer"`` additionally emit unmatched
    RIGHT rows under the mirrored eviction rule; for those modes the
    output's ``key`` column is coalesced across sides (an unmatched
    right row has no left columns). For every outer mode the right event
    time surfaces as ``r_<right_ts>`` (NULL on unmatched left rows), so
    matched and unmatched rows stay distinguishable even when the right
    stream carries no payload columns beyond key + event time.
    """
    # rename the right side BEFORE watermarking: copying a watermarked
    # column would create a second event-time column, which Structured
    # Streaming rejects (one event-time column per stream)
    renamed = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    lw = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = ensure_event_time(renamed, "__rts").withWatermark("__rts", watermark)
    cond = (
        (lw[key] == rw["__rkey"])
        & (rw["__rts"] > lw[left_ts])
        & (rw["__rts"] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            "how must be 'inner', 'left_outer', 'right_outer' or 'full_outer'"
        )
    joined = lw.join(rw, cond, how)
    if how in ("right_outer", "full_outer"):
        # unmatched RIGHT rows carry NULL left columns — coalesce the
        # key across sides
        joined = joined.withColumn(key, F.coalesce(lw[key], rw["__rkey"]))
    if how != "inner":
        # keep the right event time as r_<right_ts>: NULL marks an
        # unmatched left row, so callers need no extra right payload
        joined = joined.withColumn(f"r_{right_ts}", rw["__rts"])
    return joined.drop("__rkey", "__rts")
