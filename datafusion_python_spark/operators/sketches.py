"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark).

The 100 TB pattern behind ``approx_distinct`` (ref
``functions/__init__.py`` approx_* family): computing exact distincts
over a petabyte corpus per (day × segment) cell re-shuffles the world
every time someone asks a new rollup. Instead, build an HLL sketch once
per finest-grained cell (one scan, map-side partial aggregation), store
the sketches (KBs each), and answer every coarser rollup by *merging
sketches* — no second pass over the data. Spark 3.5+ exposes the
DataSketches HLL binary format (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so sketches written by one job are mergeable
by any later job (or by other DataSketches-speaking engines).

Everything stays JVM-side; sketches ride DataFrames as binary columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 2^12 registers ≈ 1.6% relative std error, ~2.5 KB


def hll_partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build one HLL sketch of ``value_col`` per ``group_cols`` cell.

    One shuffle on the grouping keys, with map-side partial sketching —
    each task folds its rows into a local sketch and only the ~2.5 KB
    register arrays move. This is the ingest-time step: persist the
    result keyed by the finest rollup grain you will ever need.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Merge per-cell sketches up to a coarser grain (possibly global).

    Shuffles only sketches — cost is proportional to the number of
    *cells*, not rows, which is what makes a 100 TB rollup interactive.
    Pass ``group_cols=[]`` for a single global sketch.
    """
    agg = F.hll_union_agg(sketch_col, F.lit(allow_different_lg_k)).alias(sketch_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate (bigint) from a sketch column."""
    col = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(col)


def distinct_rollup(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Distinct ``value_col`` estimates at a coarse grain, computed by
    sketching at the fine grain and merging — the one-scan rollup.

    Returns ``coarse_cols + [n_cells, approx_distinct]``. Equivalent
    (up to sketch error) to ``df.groupBy(coarse).agg(countDistinct)``,
    but reusable: the fine sketches answer *every* coarser grouping.
    """
    if not set(coarse_cols) <= set(fine_cols):
        raise ValueError("coarse_cols must be a subset of fine_cols")
    fine = hll_partial(df, fine_cols, value_col, lg_k=lg_k)
    merged = hll_merge(fine, coarse_cols)
    return merged.select(
        *coarse_cols,
        hll_estimate("hll_sketch").alias("approx_distinct"),
    )
