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
    # Round-9 rotation (tools/staleness.py ordering): first the gate
    # ADDED this round — the end-to-end curation chain — for a
    # first-ever driver row; then the 22 queries whose newest driver
    # row is r6 (VERDICT r8 ask #1: after this window nothing anywhere
    # is older than r7); then the oldest r7 rows in staleness order to
    # fill the 50-row window. Everything after the window holds a
    # green r7/r8 row and stays covered by tools/selfcheck.py.
    # new this round
    "pipe_curation_e2e",
    # r6 rows, staleness order
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
    "pipe_semantic_dedup",
    "pipe_simhash_arrow",
    "pipe_topk_arrow",
    "pipe_ann_ivf_arrow",
    "pipe_semdedup_arrow",
    "pipe_neardup_arrow",
    "stream_late_drop",
    "stream_windowed_hll",
    # oldest r7 rows, staleness order
    "tpch_q1",
    "tpch_q11",
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
    "evt_salted_agg",
    "evt_salted_join",
    "sql_unparse_roundtrip",
    "substrait_consume",
    "evt_gapfill",
    "evt_pagerank",
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
