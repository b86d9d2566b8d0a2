"""Structured Streaming extensions.

The reference is batch-only (SURVEY §2.11) — this module is the
beyond-parity streaming surface: windowed aggregation with watermarks,
session windows, and a stateful custom operator via
applyInPandasWithState. Each helper returns an unstarted streaming
DataFrame/query so callers choose sink + trigger.
"""

from .dedup_join import dedup_stream, dedup_stream_by_fingerprint, interval_join_streams
from .enrich import enrich_stream, scd2_enrich_stream
from .sinks import start_resumable_parquet_sink
from .stateful import running_total_per_key
from .windows import (
    sessionized_counts,
    sliding_counts,
    tumbling_counts,
    windowed_approx_distinct,
)

__all__ = [
    "tumbling_counts",
    "windowed_approx_distinct",
    "sliding_counts",
    "sessionized_counts",
    "running_total_per_key",
    "start_resumable_parquet_sink",
    "dedup_stream",
    "dedup_stream_by_fingerprint",
    "interval_join_streams",
    "enrich_stream",
    "scd2_enrich_stream",
]
