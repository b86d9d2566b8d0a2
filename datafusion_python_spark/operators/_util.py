"""Shared helpers for the pipeline operators."""

from __future__ import annotations


def shuffle_partitions(spark, default: int = 200) -> int:
    """The session's ``spark.sql.shuffle.partitions`` as an int.

    Used to PIN explicit exchange partition counts at applyInPandas /
    candidate-re-spread sites: grouped rows there are tiny (or few), so
    AQE's size-based coalescing would funnel them into a couple of tasks
    and serialize the per-group kernels — an explicit count is exempt
    from coalescing. Falls back to ``default`` when the conf is
    non-numeric (e.g. "auto" under vendor AQE); any fixed fan-out works,
    the point is only to defeat the coalescing.
    """
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return default
