"""Data-layout optimization: Z-order (Morton) clustering for multi-column
data skipping.

Parquet readers prune files and row groups with min/max column
statistics; sorting by one column makes only THAT column's stats
selective. Interleaving the bits of several columns into one Z-value and
range-partitioning + sorting by it keeps every participating column
locally clustered, so filters on ANY of them skip most files — the
standard layout move (Delta/Iceberg ``OPTIMIZE ZORDER BY``) that turns a
100 TB full scan into a few-percent read.

Everything is integer column math (shift/and/or chains — whole-stage
codegen, map-only); the final ``repartitionByRange`` is the one shuffle
any re-layout inherently needs, and writing preserves the per-partition
sort so file-level min/max stats come out tight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    Inputs must be non-negative integers already bucketized to
    ``[0, 2^bits)`` (see :func:`bucketize`); values are masked to the
    range. Output is a bigint with ``bits * len(cols)`` significant
    bits; bit ``b`` of column ``i`` lands at position ``b*n + i``.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit value")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        col = col.bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return out


def bucketize(col: Column | str, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by linear scaling over
    ``[lo, hi]`` (values outside clamp). ``lo``/``hi`` come from cheap
    table stats (an O(1)-row agg, or catalog statistics at scale) —
    passing them as plain floats keeps the bucketing a pure map."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    n_buckets = 1 << bits
    if hi <= lo:
        raise ValueError("hi must be > lo")
    scaled = F.floor((c - lo) / (hi - lo) * n_buckets).cast("long")
    return F.greatest(F.least(scaled, F.lit(n_buckets - 1)), F.lit(0))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int = 8,
    num_partitions: int | None = None,
    z_col: str = "__zvalue",
) -> DataFrame:
    """Re-layout ``df`` clustered by the Z-order of ``cols``: bucketize
    (using ``bounds[col]`` ranges where given, raw masked integers
    otherwise), range-partition on the Z-value, sort within partitions.

    Write the result with any sink and each output file covers a small
    hyper-rectangle of the key space — min/max stats prune on every
    participating column. One shuffle total.
    """
    bounds = bounds or {}
    keys = [
        bucketize(c, *bounds[c], bits=bits) if c in bounds else F.col(c)
        for c in cols
    ]
    z = zvalue(keys, bits=bits)
    out = df.withColumn(z_col, z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, z_col)
    else:
        out = out.repartitionByRange(z_col)
    return out.sortWithinPartitions(z_col)
