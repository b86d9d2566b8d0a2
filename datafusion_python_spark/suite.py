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
    # Round-7 rotation (tools/staleness.py ordering): first the gates
    # ADDED this round — the end-to-end LSH→verify near-dup path and
    # the checkpoint-restart exactly-once sink — for first-ever driver
    # rows; then the 17 queries whose newest driver row is r4 (VERDICT
    # r6 ask #5: after this window nothing anywhere is older than r5);
    # then the oldest r5 rows (TPC-H ran r5; the r6 window was all
    # pipeline/stream gates) to fill the 50-row window. Everything
    # after the window holds a green r5/r6 row and stays covered by
    # tools/selfcheck.py.
    # new this round
    "pipe_neardup_lsh_verify",
    "stream_restart_resume",
    "stream_static_enrich",
    # r4 rows, staleness order
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
    "udaf_geomean",
    # oldest r5 rows, staleness order
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
    "evt_session_window",
    "evt_date_bin",
    "fn_bits_epoch",
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
