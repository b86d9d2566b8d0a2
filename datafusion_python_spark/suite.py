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

# Names to place at the front of the registry (driver windows the first
# 50). Unlisted names follow in their module order.
#
# Round-3 rotation (VERDICT r2 "Next round" #1): every query whose only
# driver row predates the round-2 NTZ testdata regeneration — the 5
# never-recorded gates, the round-1-only rows, plus gates added or
# changed this round — goes inside the window. Near-duplicate gates were
# merged (agg_rollup+agg_cube+agg_grouping_sets → agg_grouping_multi,
# setop_union+setop_union_by_name → setop_union_multi, fn_bits+fn_epoch
# → fn_bits_epoch, fn_hash → folded into fn_strings, win_rank_family+
# win_value_fns → win_rank_value, join_full_outer+join_cross →
# join_outer_cross, evt_running_sum+evt_gaps → evt_running_gaps) so the
# stale set fits the 50-row window. The 50 queries recorded green in
# round 2 (CORRECTNESS_r02, current-generation testdata) sit after the
# window; `tools/staleness.py` recomputes this ordering from the
# CORRECTNESS_r*.json history.
_PRIORITY = [
    # Round-5 rotation, ordering from tools/staleness.py: the three
    # remaining round-2-recorded rows (substring dedup, gap fill,
    # session window) lead, then every round-3-recorded row — TPC-H,
    # unparse/substrait, window/agg/setop/fn gates — so all of them get
    # current-generation driver rows; after this window every registered
    # query will have an r4-or-r5 row. pipe_pii_redact /
    # pipe_semantic_dedup (r3 rows, ranks 51-52) head the round-6
    # window. All r4-green rows sit after (still selfchecked).
    # brand-new gates this round (salted agg/join, streaming) — first
    # driver rows
    "evt_salted_agg",
    "evt_salted_join",
    "stream_hourly_counts",
    "stream_dedup_distinct",
    "stream_session_stats",
    "stream_stateful_totals",
    "stream_interval_join",
    "pipe_image_roundtrip",
    # changed this round (SF-invariant threshold) — r4 row is stale
    "tpch_q11",
    "pipe_substring_dup",
    "evt_gapfill",
    "evt_session_window",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "sql_unparse_roundtrip",
    "substrait_consume",
    "evt_pagerank",
    "evt_date_bin",
    "fn_bits_epoch",
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
    "agg_grouping_multi",
    "agg_stats",
    "agg_string_agg",
    "setop_union_multi",
    "setop_intersect",
    "setop_except",
    "fn_strings",
    "fn_datetime",
    "fn_math_case",
    "pipe_pii_redact",
    "pipe_semantic_dedup",
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
