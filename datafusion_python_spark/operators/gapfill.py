"""Time-series gap filling: dense buckets + LOCF / linear interpolation.

The hypertable/continuous-aggregate idiom (TimescaleDB's
``time_bucket_gapfill`` + ``locf()`` / ``interpolate()``): bucket a
sparse event series per key, then materialize EVERY bucket in the range
— missing ones filled by carrying the last observation forward or by
linear interpolation between neighbors. Spark has no built-in; this is
the shuffle-minimal DataFrame composition:

1. bucket + aggregate: one shuffle on (key, bucket) with map-side
   partial aggregation;
2. dense axis: per key, ``sequence(min_bucket, max_bucket, stride)`` +
   ``explode`` — generated from the key's own observed span (no
   driver-side range, no cross join against a calendar table);
3. join observed onto dense — co-partitioned on (key, bucket), and at
   scale both sides came out of the same exchange;
4. fill: ``last(value, ignorenulls)`` window per key (LOCF), or the
   prev/next bracketing values + times for the linear form — two
   ordered window passes over the same (key) partitioning, no
   additional shuffle.

Bucket count per key is bounded by span/stride — a key observed over a
year at 1-minute buckets is ~526k rows; choose the stride to match the
rollup grain as a hypertable would. Skewed keys cost a window sort, not
a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_start(ts: Column, stride_secs: int) -> Column:
    """Origin-aligned (epoch) bucket start, as epoch seconds."""
    secs = ts.cast("timestamp").cast("double")
    return (F.floor(secs / stride_secs) * stride_secs).cast("long")


def bucket_aggregate(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    stride: str = "1 hour",
) -> DataFrame:
    """Sparse per-(key, bucket) aggregates; ``bucket`` is epoch seconds.

    ``aggs``: output name → aggregate Column (e.g. ``F.avg("value")``).
    """
    stride_secs = _stride_seconds(stride)
    return (
        events.withColumn("bucket", _bucket_start(F.col(ts_col), stride_secs))
        .groupBy(*key_cols, "bucket")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def _stride_seconds(stride: str) -> int:
    qty, unit = stride.split(None, 1)
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit.strip().lower()]
    return int(qty) * mult


def gapfill(
    sparse: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    stride: str = "1 hour",
    method: str = "locf",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Densify per-key bucket series and fill missing values.

    ``sparse`` is the output of :func:`bucket_aggregate` (or any frame
    with an epoch-seconds ``bucket_col``). Every stride between each
    key's first and last observed bucket appears exactly once in the
    output, with ``is_gap`` marking synthesized rows.

    method: ``'locf'`` (carry last observation forward; leading gaps
    stay null), ``'linear'`` (interpolate between bracketing
    observations; gaps before the first / after the last observation
    stay null), or ``'null'`` (densify only).
    """
    if method not in ("locf", "linear", "null"):
        raise ValueError("method must be locf, linear, or null")
    stride_secs = _stride_seconds(stride)

    dense_axis = (
        sparse.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(stride_secs))
            ).alias(bucket_col),
        )
    )
    joined = dense_axis.join(
        sparse.withColumn("__obs", F.lit(True)), [*key_cols, bucket_col], "left"
    ).withColumn("is_gap", F.col("__obs").isNull()).drop("__obs")

    if method == "null":
        return joined

    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    past = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if method == "locf":
        out = joined
        for v in value_cols:
            out = out.withColumn(v, F.last(v, ignorenulls=True).over(past))
        return out

    # linear: bracket each gap with the previous/next observed (t, v)
    future = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = joined
    for v in value_cols:
        obs = F.when(~F.col("is_gap"), F.struct(F.col(bucket_col).alias("t"), F.col(v).alias("v")))
        prev = F.last(obs, ignorenulls=True).over(past)
        nxt = F.first(obs, ignorenulls=True).over(future)
        frac = (F.col(bucket_col) - prev["t"]) / (nxt["t"] - prev["t"])
        filled = F.when(~F.col("is_gap"), F.col(v)).otherwise(
            F.when(
                prev.isNotNull() & nxt.isNotNull(),
                prev["v"] + (nxt["v"] - prev["v"]) * frac,
            )
        )
        out = out.withColumn(v, filled)
    return out
