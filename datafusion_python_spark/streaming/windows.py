"""Event-time windowed aggregations with watermarks.

Late data beyond the watermark is dropped by Spark's state store;
window state is partitioned by (key, window), so a 1000-executor
cluster shards it horizontally — the same code runs unchanged at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import ensure_event_time


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-key counts over non-overlapping event-time windows."""
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping sliding windows (each event lands in window/slide buckets)."""
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def windowed_approx_distinct(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    lg_k: int = 12,
) -> DataFrame:
    """Approximate distinct ``value_col`` per (key, window) over a stream.

    ``count(DISTINCT)`` is unsupported in streaming aggregations (state
    would grow with the number of distinct values); an HLL sketch is the
    standard fix — per-window state is a fixed ~2.5 KB register array
    regardless of cardinality, so watermark eviction bounds total state
    by live windows, not by distinct users. The emitted sketch column
    also merges downstream (`operators.sketches.hll_merge`) for coarser
    rollups of the stream's history without reprocessing.
    """
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            F.hll_sketch_estimate("hll_sketch").alias("approx_distinct"),
            "hll_sketch",
        )
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based, dynamic length) per key."""
    return (
        ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
