"""Unified query registry: name → (spark_fn, oracle_sql | None).

``spark_fn(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is ANSI SQL that
DuckDB evaluates over the same parquet tables for the driver's
correctness gate. Entries with ``None`` oracle are non-SQL-expressible
(approx sketches, hash-function-specific ops) and get rows-only checks.

Ordering matters: the driver records correctness rows for (at most) the
first 50 entries, so the registry is ordered to put the queries that
most need an on-record gate first — the pipeline (dedup / similarity /
text) operators, gates added this round, and previously-unwindowed fn_*
/ setop_* queries — then the TPC-H suite, then queries that already have
a recorded driver pass from round 1. Every query not in the window is
still verified by ``tools/selfcheck.py`` (same DuckDB comparison).
"""

from __future__ import annotations

from .suite_analytics import ANALYTICS_QUERIES
from .suite_tpch import TPCH_QUERIES

_MERGED: dict[str, tuple] = {}
_MERGED.update(TPCH_QUERIES)
_MERGED.update(ANALYTICS_QUERIES)

try:  # beyond-parity pipeline ops (dedup / similarity / text analysis)
    from .suite_pipeline import PIPELINE_QUERIES

    _MERGED.update(PIPELINE_QUERIES)
except ImportError:  # module lands later in the build
    pass

try:  # UDF/UDAF gate queries
    from .suite_udf import UDF_QUERIES

    _MERGED.update(UDF_QUERIES)
except ImportError:
    pass

try:  # Structured Streaming gates (memory-sink bounded replay)
    from .suite_streaming import STREAMING_QUERIES

    _MERGED.update(STREAMING_QUERIES)
except ImportError:
    pass

# Names to place at the front of the registry (driver windows the
# first 50). Unlisted names follow in their module order;
# `tools/staleness.py` recomputes this ordering from the
# CORRECTNESS_r*.json history.
_PRIORITY = [
    # Round-8 rotation (tools/staleness.py ordering): first the gate
    # ADDED this round — the watermarked left-outer stream-stream join
    # — for a first-ever driver row; then the 20 queries whose newest
    # driver row is r5 (VERDICT r7 ask #2: after this window nothing
    # anywhere is older than r6); then the oldest r6 rows in staleness
    # order to fill the 50-row window. Everything after the window
    # holds a green r6/r7 row and stays covered by tools/selfcheck.py.
    # new this round
    "stream_outer_join",
    "stream_full_outer_join",
    # r5 rows, staleness order
    "win_frames",
    "win_rank_value",
    "agg_regr",
    "join_outer_cross",
    "fn_conditional",
    "fn_array_ops",
    "evt_topk_per_user",
    "evt_running_gaps",
    "evt_sessionize",
    "evt_distinct_on",
    "evt_pivot",
    "evt_hourly",
    "evt_json",
    "pipe_image_roundtrip",
    "pipe_substring_dup",
    "stream_hourly_counts",
    "stream_dedup_distinct",
    "stream_session_stats",
    "stream_stateful_totals",
    "stream_interval_join",
    # oldest r6 rows, staleness order
    "tpch_q2",
    "evt_funnel",
    "evt_retention",
    "evt_asof_attribution",
    "evt_range_join",
    "agg_approx",
    "win_groups_frame",
    "agg_grouping_multi",
    "agg_stats",
    "agg_distinct_filter",
    "agg_percentiles",
    "agg_string_agg",
    "agg_string_agg_desc",
    "fn_like_escape",
    "sql_recursive_cte",
    "agg_weighted_pct",
    "fn_time",
    "setop_union_multi",
    "setop_intersect",
    "setop_except",
    "fn_strings",
    "fn_datetime",
    "fn_math_case",
    "pipe_pii_redact",
    "pipe_hll_rollup",
    "pipe_zorder_layout",
    "pipe_dedup_incremental",
    "pipe_perplexity",
]

ALL_QUERIES: dict[str, tuple] = {}
for _name in _PRIORITY:
    if _name in _MERGED:
        ALL_QUERIES[_name] = _MERGED[_name]
for _name, _entry in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _entry


def queries():
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracles():
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
