"""Unified query registry: name → (spark_fn, oracle_sql | None).

``spark_fn(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is ANSI SQL that
DuckDB evaluates over the same parquet tables for the driver's
correctness gate. Entries with ``None`` oracle are non-SQL-expressible
(approx sketches, hash-function-specific ops) and get rows-only checks.
"""

from __future__ import annotations

from .suite_analytics import ANALYTICS_QUERIES
from .suite_tpch import TPCH_QUERIES

ALL_QUERIES: dict[str, tuple] = {}
ALL_QUERIES.update(TPCH_QUERIES)
ALL_QUERIES.update(ANALYTICS_QUERIES)

try:  # beyond-parity pipeline ops (dedup / similarity / text analysis)
    from .suite_pipeline import PIPELINE_QUERIES

    ALL_QUERIES.update(PIPELINE_QUERIES)
except ImportError:  # module lands later in the build
    pass


def queries():
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracles():
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
