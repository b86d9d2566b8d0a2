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
    # Round-4 rotation (VERDICT r3 "Next round" #1-2), ordering from
    # tools/staleness.py: win_groups_frame's only row is the red r3 one
    # (oracle HUGEINT typing, fixed this round); agg_distinct_filter /
    # agg_percentiles have round-1-only rows predating the NTZ testdata
    # regen; the rest of the window refreshes round-2 rows, oldest class
    # first. All r3-green rows sit after the window (still selfchecked).
    "win_groups_frame",
    "agg_distinct_filter",
    "agg_percentiles",
    # new gate this round (mixture sampling) — needs its first driver row
    "pipe_mixture_sample",
    # round-2-recorded rows, per staleness ranking
    "pipe_dedup_exact",
    "pipe_jaccard_pairs",
    "pipe_minhash_lsh",
    "pipe_simhash",
    "pipe_cosine_topk",
    "pipe_ann_lsh",
    "pipe_ann_ivf",
    "pipe_cosine_neardup",
    "pipe_emb_centroid",
    "pipe_text_tokens",
    "pipe_text_quality",
    "pipe_langid",
    "pipe_fingerprint",
    "pipe_dedup_cluster",
    "pipe_sample_hash",
    "pipe_domain_cap",
    "pipe_token_pack",
    "pipe_repetition",
    "pipe_minhash_cluster",
    "pipe_decontaminate",
    "pipe_sample_stratified",
    "evt_asof_attribution",
    "evt_range_join",
    "pipe_quality_score",
    "pipe_emb_quant",
    "tpch_q2",
    "tpch_q11",
    "agg_approx",
    "agg_string_agg_desc",
    "fn_like_escape",
    "sql_recursive_cte",
    "agg_weighted_pct",
    "fn_time",
    "udaf_geomean",
    "pipe_hll_rollup",
    "pipe_tfidf",
    "pipe_bm25",
    "pipe_chunk",
    "pipe_shuffle_order",
    "pipe_rand_proj",
    "pipe_zorder_layout",
    "pipe_dedup_incremental",
    "pipe_perplexity",
    "evt_funnel",
    "evt_retention",
    "pipe_fuzzy_match",
    "pipe_substring_dup",
    "evt_gapfill",
    "evt_session_window",
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
