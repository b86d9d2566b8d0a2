"""Shared streaming helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce ``ts_col`` to TIMESTAMP if needed.

    Structured Streaming's event-time machinery (``withWatermark``,
    window state eviction) requires TIMESTAMP; the testdata's naive
    TIMESTAMP_NTZ is rejected outright. Casting reinterprets the naive
    value in the session zone — pinned UTC in session.py — so the
    conversion is exact and deterministic.
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
