"""Skew mitigation: salted joins and two-phase aggregations.

AQE's skew-join handling splits oversized *partitions*, but a single
hot KEY (one domain with 10⁹ pages, one null-ish default id) still
lands every row on one task. Salting is the classic fix and is pure
DataFrame algebra:

- salted aggregation: aggregate on (key, salt) first — N-way parallel —
  then re-aggregate on key. Works for any algebraic aggregate.
- salted join: explode the dimension side ×S (keys get every salt), add
  a random-but-deterministic salt to the fact side, join on (key,
  salt) — the hot key's rows spread over S tasks. Dimension row count
  multiplies by S, so use it for modest dimensions or a skewed-key
  subset (``only_keys``) — the hybrid plan that handles web-scale skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets) — xxhash of the whole
    row's key columns plus a disambiguator, so reruns place rows
    identically (no RNG, no partition sensitivity)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(0x5A17)), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output column → ``(how, input_col)`` with how one of
    sum/count/min/max (the algebraic aggregates that re-combine; avg =
    sum+count composed by the caller). Phase 1 groups on (keys, salt) —
    a hot key fans out over ``salt_buckets`` tasks; phase 2 combines the
    per-salt partials (count re-combines by SUM). Spark's partial
    aggregation does this per-PARTITION already; salting ALSO splits the
    reduce-side work, which matters when one key dominates a reducer.
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for how, _src in aggs.values():
        if how not in combiner:
            raise ValueError(f"unsupported agg {how!r} (use sum/count/min/max)")
    salt_src = salt_on or sorted({c for _h, c in aggs.values()} | set(group_cols))
    salted = df.withColumn("__salt", _salt_col(salt_src, salt_buckets))
    p1 = salted.groupBy(*group_cols, "__salt").agg(
        *[phase1_fn[how](src).alias(out) for out, (how, src) in aggs.items()]
    )
    return p1.groupBy(*group_cols).agg(
        *[combiner[how](out).alias(out) for out, (how, src) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
    only_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join where the fact side's key distribution is skewed.

    The dim side is exploded ×``salt_buckets`` (every key carries every
    salt); the fact side gets one deterministic salt per row; the join
    runs on ``on + [salt]`` so a hot key spreads across tasks. With
    ``only_keys`` (a DataFrame of the known-hot key values), only those
    keys are salted and the remainder joins normally — the hybrid that
    keeps the dim explosion proportional to the hot subset.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    fact_cols = [c for c in fact.columns]
    dim_payload = [c for c in dim.columns if c not in on]

    def _do_salted(f_df: DataFrame, d_df: DataFrame) -> DataFrame:
        salts = F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1))
        ).alias("__salt")
        d = d_df.select("*", salts)
        # salt must VARY WITHIN a key (a key-only hash would re-collapse
        # the hot key onto one salt) — hash the whole fact row
        fa = f_df.withColumn("__salt", _salt_col(fact_cols, salt_buckets))
        return fa.join(d, on + ["__salt"], how).drop("__salt")

    if only_keys is None:
        return _do_salted(fact, dim)
    hot = F.broadcast(only_keys.select(*on).distinct())
    fact_hot = fact.join(hot, on, "left_semi")
    fact_cold = fact.join(hot, on, "left_anti")
    dim_hot = dim.join(hot, on, "left_semi")
    out_hot = _do_salted(fact_hot, dim_hot)
    out_cold = fact_cold.join(dim, on, how)
    return out_hot.select(*fact_cols, *dim_payload).unionByName(
        out_cold.select(*fact_cols, *dim_payload)
    )
