"""q2/q11 sf1 probe: job-count reduction variants (round-8 verdict #3).

q11: the committed plan evaluates the `value` agg subtree in two
branches (scalar-threshold broadcast build + probe). Variant computes
the threshold with a GLOBAL window over the ~200k aggregated rows —
one linear plan, no broadcast-build job.

q2: the committed plan semi-joins the two broadcast dims, aggregates,
then RE-joins both dims to recover their columns (two more broadcast
builds + joins). Variant attaches the dim columns on the way in
(inner broadcast joins — dims unique on their keys, so inner == semi
+ columns) and carries them through the agg with first().

Also prints per-job wall decomposition via the status tracker.

Usage: python tools/q2q11_probe.py [--variant NAME] [--repeats N]
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


def q11_window(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    n_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    value = (
        li.join(F.broadcast(n_supp), li.l_suppkey == n_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value_raw"))
    )
    thr = (F.avg("value_raw").over(Window.partitionBy()) * 2.0).alias("threshold")
    return (
        value.withColumn("threshold", thr)
        .filter(F.col("value_raw") > F.col("threshold"))
        .select("l_partkey", F.round("value_raw", 2).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


def q2_attach(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = _t(spark, sf_dir, "lineitem")

    eu_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    eu_supp = supp.join(
        F.broadcast(eu_nations), supp.s_nationkey == eu_nations.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")

    enriched = li.join(
        F.broadcast(part.select("p_partkey", "p_name")),
        li.l_partkey == F.col("p_partkey"),
    ).join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
    cost = enriched.groupBy("p_partkey", "s_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"),
        F.first("p_name").alias("p_name"),
        F.first("s_name").alias("s_name"),
        F.first("s_acctbal").alias("s_acctbal"),
        F.first("n_name").alias("n_name"),
    )
    return (
        cost.withColumn(
            "min_cost", F.min("supplycost").over(Window.partitionBy("p_partkey"))
        )
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


VARIANTS = {
    "q11_current": TPCH_QUERIES["tpch_q11"][0],
    "q11_window": q11_window,
    "q2_current": TPCH_QUERIES["tpch_q2"][0],
    "q2_attach": q2_attach,
}


def main():
    repeats = 5
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--repeats" and i + 1 < len(sys.argv):
            repeats = int(sys.argv[i + 1])
        if a == "--variant" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1]
    out = os.environ.get("SPARK_GRAFT_SCALEBENCH_DIR", "/tmp/scalebench_sf1")
    spark = get_spark("q2q11probe")

    names = [only] if only else list(VARIANTS)
    # correctness cross-check against the committed plan
    for base in ("q11", "q2"):
        if only and not only.startswith(base):
            continue
        ref = [tuple(r) for r in VARIANTS[f"{base}_current"](spark, out).collect()]
        for name in names:
            if not name.startswith(base) or name.endswith("current"):
                continue
            got = [tuple(r) for r in VARIANTS[name](spark, out).collect()]
            print(("OK " if got == ref else "MISMATCH") + f" {name} ({len(got)} rows)")

    sc = spark.sparkContext
    for name in names:
        fn = VARIANTS[name]
        fn(spark, out).write.format("noop").mode("overwrite").save()
        runs = []
        jobs_before = len(sc.statusTracker().getJobIdsForGroup() or [])
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
