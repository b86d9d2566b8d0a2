"""Temporal joins Spark lacks as built-ins: as-of join and range
(point-in-window) join, both expressed as shuffle-once DataFrame
compositions.

As-of join (the pandas ``merge_asof`` / kdb ``aj`` shape): for every
left row, the closest right row at-or-before (backward), at-or-after
(forward), or nearest in time, per key. The classic 100 TB
implementation trap is a range self-join (quadratic per key); instead
we UNION the tagged sides and run one ``last(..., ignorenulls=True)``
window — a single shuffle on the key, linear scan per partition,
whole-stage-codegen window. Spark has no native as-of; Structured
Streaming's interval join covers the streaming case
(``streaming/dedup_join.py``).

Range join: left row's time window [ts+lower, ts+upper] matched to
right rows inside it, per key. Naive theta-join degenerates to a
per-key cross product; we bucket time at ``bucket`` width, explode the
left window into its covered buckets (bounded, ~(upper-lower)/bucket
rows), and equi-join on (key, bucket) — each right row lives in exactly
one bucket, so matches are produced exactly once and the join stays a
hash join with pushdown-friendly residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _payload_struct(df: DataFrame, cols: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in cols])


def _secs(c: Column, dtype: str) -> Column:
    """Seconds-as-double for ordering/bucket math. TIMESTAMP_NTZ (the
    testdata's naive timestamps) cannot cast to numeric directly; going
    through TIMESTAMP reinterprets in the session zone — pinned UTC in
    session.py, so exact. Numeric on-columns pass straight through."""
    if dtype.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Per left row, attach the closest right row's columns.

    direction: 'backward' (right.ts <= left.ts, the default), 'forward'
    (right.ts >= left.ts), or 'nearest' (smaller absolute gap; ties go
    backward). ``tolerance`` (an interval Column, e.g.
    ``F.expr("INTERVAL 30 MINUTES")``) nulls out matches farther than
    the bound — left rows are always kept (left-outer semantics, like
    ``merge_asof``). Right columns come back ``right_prefix``-ed; the
    right's ``on`` column as ``{prefix}{on}``.

    One shuffle of each side on (by,) for the window sort; no range
    join, no per-key quadratic blowup — safe for skewed keys at scale
    (a hot key costs a sort, not a cross product).
    """
    if direction == "nearest":
        back = asof_join(left, right, on, by, "backward", tolerance, right_prefix)
        fwd = asof_join(left, right, on, by, "forward", tolerance, right_prefix)
        rcols = [c for c in back.columns if c.startswith(right_prefix)]
        rts = f"{right_prefix}{on}"
        f_sel = [F.col(f"f.{c}").alias(f"__f_{c}") for c in rcols]
        both = back.alias("b").join(
            fwd.alias("f").select(*[F.col(c) for c in left.columns], *f_sel),
            on=left.columns,
            how="inner",
        )
        on_dtype = dict(left.dtypes)[on]
        b_gap = _secs(F.col(on), on_dtype) - _secs(F.col(rts), on_dtype)
        f_gap = _secs(F.col(f"__f_{rts}"), on_dtype) - _secs(F.col(on), on_dtype)
        use_fwd = F.col(rts).isNull() | (
            F.col(f"__f_{rts}").isNotNull() & (f_gap < b_gap)
        )
        out = both.select(
            *left.columns,
            *[
                F.when(use_fwd, F.col(f"__f_{c}")).otherwise(F.col(c)).alias(c)
                for c in rcols
            ],
        )
        return out
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward, forward, or nearest")

    keys = [by] if isinstance(by, str) else list(by or [])
    rcols = [c for c in right.columns if c not in keys]
    lt, rt = left.alias("l"), right.alias("r")
    # tag: right rows must sort before left rows at equal ts so an
    # exact-ts right row is visible to the left row (inclusive match)
    l_side = lt.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(1).alias("__pri"),
        _payload_struct(lt, left.columns).alias("__lrow"),
        F.lit(None).cast(
            rt.select(_payload_struct(rt, rcols)).schema[0].dataType
        ).alias("__rrow"),
    )
    r_side = rt.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__t"),
        F.lit(0).alias("__pri"),
        F.lit(None).cast(
            lt.select(_payload_struct(lt, left.columns)).schema[0].dataType
        ).alias("__lrow"),
        _payload_struct(rt, rcols).alias("__rrow"),
    )
    unioned = l_side.unionByName(r_side)
    asc = direction == "backward"
    order = [F.col("__t").asc() if asc else F.col("__t").desc(), F.col("__pri").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__rrow", ignorenulls=True).over(w)
    ).filter(F.col("__pri") == 1)
    if tolerance is not None:
        gap_ok = (
            (F.col("__t") <= F.col(f"__m.{on}") + tolerance)
            if not asc
            else (F.col("__t") >= F.col(f"__m.{on}") - tolerance)
        )
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & gap_ok, F.col("__m"))
        )
    return matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    on: str = "ts",
    lower=None,
    upper=None,
    bucket: str = "30 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs (l, r) with ``l.ts+lower <= r.ts <= l.ts+upper`` per key.

    ``lower``/``upper`` are interval Columns (e.g.
    ``F.expr("INTERVAL -30 MINUTES")`` / ``F.lit interval 0``);
    ``bucket`` sizes the time quantum: the left side explodes into
    ~(upper-lower)/bucket bucket rows, the right maps to exactly one —
    so the equi-join on (key, bucket) emits each true pair once and the
    residual between-filter runs inside the hash join. Choose ``bucket``
    near the window span; a 100× wider window only widens the left
    fan-out factor, never a per-key cross product.
    """
    keys = [by] if isinstance(by, str) else list(by)
    lower = lower if lower is not None else F.expr("INTERVAL 0 SECONDS")
    upper = upper if upper is not None else F.expr("INTERVAL 0 SECONDS")
    step = F.expr(f"INTERVAL {bucket}")
    bucket_secs = F.unix_timestamp(
        F.to_timestamp(F.lit("1970-01-01 00:00:00")) + step
    )
    rcols = [c for c in right.columns if c not in keys]

    on_dtype = dict(left.dtypes)[on]
    lo = _secs(F.col(on) + lower, on_dtype)
    hi = _secs(F.col(on) + upper, on_dtype)
    l_b = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(lo / bucket_secs).cast("long"),
                F.floor(hi / bucket_secs).cast("long"),
            )
        ).alias("__bucket"),
    )
    r_b = right.select(
        *[F.col(k) for k in keys],
        F.floor(_secs(F.col(on), dict(right.dtypes)[on]) / bucket_secs).cast("long").alias("__bucket"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    )
    r_on = f"{right_prefix}{on}"
    cond = (F.col(r_on) >= F.col(on) + lower) & (F.col(r_on) <= F.col(on) + upper)
    return (
        l_b.join(r_b, on=[*keys, "__bucket"], how="inner")
        .filter(cond)
        .drop("__bucket")
    )
