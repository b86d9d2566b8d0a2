"""q16 sf1 experiment bench: time the committed q16 against candidate
rewrites of the exact-distinct stage (round-8 verdict #1).

Variants:
  current      — committed q16 (dictionary cid + pinned repartition + distinct)
  packed       — pack (cid, suppkey) into ONE bigint shuffle key
  collect_set  — groupBy(cid).agg(size(collect_set(suppkey))): map-side
                 set combine dedups BEFORE the exchange and collapses the
                 two shuffles (pair-distinct + cid-count) into one
  packed_set   — collect_set over the packed key (control: should match
                 collect_set since cid is already the group key)

Usage: python tools/q16_probe.py [--repeats N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_python_spark.session import get_spark
from datafusion_python_spark.suite_tpch import TPCH_QUERIES, _t


def _combos(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    combos = (
        part.select("p_brand", "p_type", "p_size")
        .distinct()
        .withColumn(
            "cid",
            F.row_number().over(Window.orderBy("p_brand", "p_type", "p_size")),
        )
    )
    pdim = part.join(F.broadcast(combos), ["p_brand", "p_type", "p_size"]).select(
        "p_partkey", "cid"
    )
    return combos, pdim


def _npart(spark):
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return 200


def q16_packed(spark, sf_dir):
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    packed = (F.col("cid").cast("long") * F.lit(1 << 40) + F.col("l_suppkey")).alias(
        "ck"
    )
    pairs = (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey)
        .select(packed)
        .repartition(_npart(spark), "ck")
        .distinct()
    )
    return (
        pairs.select((F.col("ck") / F.lit(1 << 40)).cast("int").alias("cid"))
        .groupBy("cid")
        .agg(F.count("*").alias("supplier_cnt"))
        .join(F.broadcast(combos), "cid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def q16_collect_set(spark, sf_dir):
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey)
        .groupBy("cid")
        .agg(F.size(F.collect_set("l_suppkey")).alias("supplier_cnt"))
        .join(F.broadcast(combos), "cid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def q16_packed_distinct_nopin(spark, sf_dir):
    # packed key, plain distinct (let Spark's partial agg run pre-exchange
    # on the packed key — measures whether map-side dedup pays at sf1)
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    packed = (F.col("cid").cast("long") * F.lit(1 << 40) + F.col("l_suppkey")).alias(
        "ck"
    )
    pairs = (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey)
        .select(packed)
        .distinct()
    )
    return (
        pairs.select((F.col("ck") / F.lit(1 << 40)).cast("int").alias("cid"))
        .groupBy("cid")
        .agg(F.count("*").alias("supplier_cnt"))
        .join(F.broadcast(combos), "cid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def q16_bitmap(spark, sf_dir):
    # round-9 probe: per-(cid, bucket) suppkey BITMAPS — the group key
    # drops to ~7.5k × n_buckets, so Spark's pre-exchange partial
    # aggregate finally combines (OR-ing bitmaps map-side); the exchange
    # then carries one 4 KB bitmap per (cid, bucket, map task) instead
    # of raw pairs. Distinct count = popcount after the merge.
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey)
        .select("cid", F.bitmap_bucket_number(F.col("l_suppkey")).alias("bkt"),
                F.bitmap_bit_position(F.col("l_suppkey")).alias("pos"))
        .groupBy("cid", "bkt")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
        .groupBy("cid")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("supplier_cnt"))
        .join(F.broadcast(combos), "cid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def q16_sorted_lag(spark, sf_dir):
    # round-9 probe: sort-based dedup — one exchange on cid only, sort
    # within partition by suppkey, count first-occurrences via lag.
    # Replaces the hash-distinct with a sort; same wire bytes.
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("cid").orderBy("l_suppkey")
    pairs = (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey)
        .select("cid", "l_suppkey")
        .repartition(_npart(spark), "cid")
    )
    firsts = pairs.withColumn(
        "is_new",
        (F.lag("l_suppkey").over(w).isNull()
         | (F.col("l_suppkey") != F.lag("l_suppkey").over(w))).cast("long"),
    )
    return (
        firsts.groupBy("cid")
        .agg(F.sum("is_new").alias("supplier_cnt"))
        .join(F.broadcast(combos), "cid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


VARIANTS = {
    "current": TPCH_QUERIES["tpch_q16"][0],
    "packed": q16_packed,
    "packed_nopin": q16_packed_distinct_nopin,
    "collect_set": q16_collect_set,
    "bitmap": q16_bitmap,
    "sorted_lag": q16_sorted_lag,
}


def decompose(spark, sf_dir):
    """Fixed-vs-data decomposition of the committed q16: time each
    prefix of the plan so the residual over the reference is attributed
    to a concrete stage (exchange write+read vs dedup CPU vs the rest)."""
    combos, pdim = _combos(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    n = _npart(spark)
    joined = li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey).select(
        "cid", "l_suppkey"
    )
    stages = {
        "scan+bjoin+project": joined,
        "+exchange": joined.repartition(n, "cid", "l_suppkey"),
        "+distinct": joined.repartition(n, "cid", "l_suppkey").distinct(),
        "+count_per_cid": joined.repartition(n, "cid", "l_suppkey")
        .distinct()
        .groupBy("cid")
        .agg(F.count("*").alias("supplier_cnt")),
        "full_q16": TPCH_QUERIES["tpch_q16"][0](spark, sf_dir),
    }
    from tools.shuffle_audit import audit_one

    for name, df in stages.items():
        df.write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"{name}: best {min(runs):.3f}s runs={['%.2f' % r for r in runs]}")
    # bytes-on-wire for the full plan (its output is 20 rows, safe to
    # collect; intermediate stages above are millions of rows)
    m = audit_one(stages["full_q16"])
    print(
        f"full_q16 metrics: scan {m['scan_bytes']:,}B, shuffle "
        f"{m['shuffle_bytes']:,}B / {m['shuffle_records']:,} rows over "
        f"{m['shuffles']} exchanges, spill {m['spill_bytes']:,}B"
    )


def main():
    repeats = 5
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--repeats" and i + 1 < len(sys.argv):
            repeats = int(sys.argv[i + 1])
        if a == "--variant" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1]
    out = os.environ.get("SPARK_GRAFT_SCALEBENCH_DIR", "/tmp/scalebench_sf1")
    spark = get_spark("q16probe")
    if not os.path.isdir(f"{out}/lineitem.parquet"):
        from tools.scalebench import replicate

        replicate(spark, "/root/testdata/sf0.1", out, 10)

    if only == "decompose":
        decompose(spark, out)
        return

    names = [only] if only else list(VARIANTS)
    if not only:
        ref = [tuple(r) for r in VARIANTS["current"](spark, out).collect()]
        for name in names:
            got = [tuple(r) for r in VARIANTS[name](spark, out).collect()]
            tag = "OK " if got == ref else "MISMATCH"
            print(f"{tag} {name}")

    for name in names:
        fn = VARIANTS[name]
        fn(spark, out).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, out).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: best {min(runs):.3f}s median {statistics.median(runs):.3f}s"
            f" runs={['%.2f' % r for r in runs]}"
        )


if __name__ == "__main__":
    main()
