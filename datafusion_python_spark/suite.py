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
    # Round-6 rotation (tools/staleness.py ordering): first the gates
    # ADDED this round — the four Arrow-kernel twins and the
    # watermark-eviction replay — for first-ever driver rows; then the
    # 11 queries whose newest driver row is r3 (they complete the
    # "every query has an r4+ row" rotation VERDICT r5 asked for);
    # then r4-recorded rows by staleness rank to fill the 50-row
    # window. Everything after the window holds a green r4/r5 row and
    # stays covered by tools/selfcheck.py.
    # new this round
    "pipe_topk_arrow",
    "pipe_ann_ivf_arrow",
    "pipe_semdedup_arrow",
    "pipe_neardup_arrow",
    "stream_late_drop",
    "stream_windowed_hll",
    "pipe_simhash_arrow",
    # last r3-recorded rows
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
    # r4 rows, staleness order
    "tpch_q2",
    "evt_funnel",
    "evt_retention",
    "evt_asof_attribution",
    "evt_range_join",
    "agg_approx",
    "win_groups_frame",
    "agg_distinct_filter",
    "agg_percentiles",
    "agg_string_agg_desc",
    "fn_like_escape",
    "sql_recursive_cte",
    "agg_weighted_pct",
    "fn_time",
    "pipe_hll_rollup",
    "pipe_zorder_layout",
    "pipe_dedup_incremental",
    "pipe_perplexity",
    "pipe_fuzzy_match",
    "pipe_tfidf",
    "pipe_bm25",
    "pipe_chunk",
    "pipe_shuffle_order",
    "pipe_rand_proj",
    "pipe_quality_score",
    "pipe_emb_quant",
    "pipe_decontaminate",
    "pipe_sample_stratified",
    "pipe_mixture_sample",
    "pipe_dedup_exact",
    "pipe_jaccard_pairs",
    "pipe_minhash_lsh",
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
