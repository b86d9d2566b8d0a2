"""Event-sequence analytics: ordered funnels and cohort retention.

Both are standard product-analytics operators the reference's users run
over event tables; here they're pure DataFrame compositions designed
for the shuffle budget of a 100 TB event store:

- funnel: one filtered min-aggregation per step, all hash-partitioned
  by user — k steps cost k co-partitioned aggregations over
  *step-filtered* slices (each step's filter pushes to the scan), never
  a per-user sort of the whole history;
- retention: collapse to distinct (user, day) first — the smallest
  sufficient statistic — so the heavy table shrinks before any join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Column | None = None,
) -> DataFrame:
    """Strict ordered funnel: per user, the earliest time of step 1, then
    the earliest step-2 event strictly after it, and so on.

    Returns one row per user who completed step 1, with nullable
    ``t0..t{k-1}`` timestamps and ``steps_completed``. ``within``
    optionally bounds the whole funnel: a Column interval (e.g.
    ``F.expr("INTERVAL 7 DAYS")``) that the last step must fall inside,
    measured from t0.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        need = sorted({f"t{i - 1}", "t0"}) if within is not None else [f"t{i - 1}"]
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, *need), user_col)
            .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
        )
        if within is not None:
            nxt = nxt.filter(F.col(ts_col) <= F.col("t0") + within)
        nxt = nxt.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        cur = cur.join(nxt, user_col, "left")
    completed = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return cur.withColumn("steps_completed", completed.cast("int"))


def funnel_summary(funnel_df: DataFrame) -> DataFrame:
    """(steps_completed, n_users) — the classic funnel bar chart."""
    return (
        funnel_df.groupBy("steps_completed")
        .agg(F.count("*").alias("n_users"))
        .orderBy("steps_completed")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day;
    ``n_users`` active per (cohort, day_offset).

    Shrinks to distinct (user, day) before anything else — at 100 TB
    that single distinct is the only pass over raw events; everything
    after operates on |users| × |days| rows.
    """
    days = events.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    first = days.groupBy(user_col).agg(F.min("d").alias("cohort"))
    return (
        days.join(first, user_col)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.datediff(F.col("d"), F.col("cohort")).alias("day_offset"),
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort", "day_offset")
    )
