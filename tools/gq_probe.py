"""DBBENCH straggler probe at 1e8 (round-8 verdict #7): gq6 and gq10.

gq6 (`percentile(v3,0.5)` + stddev by (id4,id5), 10k groups): the mixed
TypedImperative+declarative agg plans as ObjectHashAggregate, whose
sort-based fallback triggers at 128 distinct groups
(`spark.sql.objectHashAggregate.sortBased.fallbackThreshold`) — at 10k
groups the whole 1e8-row input gets SORTED. Variants: raise the
threshold; split the families (r6 agg_approx lesson); window median.

gq10 (groupBy six id cols, ~n distinct groups): the q16
nearly-unique-groups lesson — pre-shuffle partial agg combines nothing
and burns a full hash build; variant repartitions on the keys first
(pinned count) so the single agg runs post-exchange.

Usage: python tools/gq_probe.py [--n 100000000] [--variant NAME]
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
from tools.dbbench import build

FALLBACK_KEY = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"


def gq6_current(spark, x):
    return x.groupBy("id4", "id5").agg(
        F.expr("percentile(v3, 0.5D)").alias("median_v3"),
        F.stddev("v3").alias("sd_v3"),
    )


def gq6_split(spark, x):
    med = x.groupBy("id4", "id5").agg(
        F.expr("percentile(v3, 0.5D)").alias("median_v3")
    )
    sd = x.groupBy("id4", "id5").agg(F.stddev("v3").alias("sd_v3"))
    return med.join(sd, ["id4", "id5"])


def gq6_window(spark, x):
    w = Window.partitionBy("id4", "id5").orderBy("v3")
    mid = x.select(
        "id4",
        "id5",
        "v3",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("id4", "id5")).alias("cnt"),
    )
    # median = avg of the middle one (odd cnt) or two (even cnt) rows:
    # lower middle = floor((cnt+1)/2), upper middle = floor(cnt/2)+1 —
    # equal for odd cnt, adjacent for even (matches percentile(0.5)'s
    # linear interpolation exactly at q=0.5)
    return mid.groupBy("id4", "id5").agg(
        F.avg(
            F.when(
                (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
                | (F.col("rn") == F.floor(F.col("cnt") / 2) + 1),
                F.col("v3"),
            )
        ).alias("median_v3"),
        F.stddev("v3").alias("sd_v3"),
    )


def gq10_current(spark, x):
    return x.groupBy("id1", "id2", "id3", "id4", "id5", "id6").agg(
        F.sum("v3").alias("v3"), F.count("*").alias("cnt")
    )


def gq10_repart(spark, x):
    from datafusion_python_spark.operators._util import shuffle_partitions

    cols = ["id1", "id2", "id3", "id4", "id5", "id6"]
    n_part = shuffle_partitions(spark)
    return (
        x.repartition(n_part, *cols)
        .groupBy(*cols)
        .agg(F.sum("v3").alias("v3"), F.count("*").alias("cnt"))
    )


VARIANTS = {
    "gq6_current": (gq6_current, None),
    "gq6_thresh": (gq6_current, 1 << 20),
    "gq6_split": (gq6_split, None),
    "gq6_window": (gq6_window, None),
    "gq10_current": (gq10_current, None),
    "gq10_repart": (gq10_repart, None),
}


def main():
    n = 100_000_000
    only = None
    repeats = 3
    for i, a in enumerate(sys.argv):
        if a == "--n" and i + 1 < len(sys.argv):
            n = int(sys.argv[i + 1])
        if a == "--variant" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1]
        if a == "--repeats" and i + 1 < len(sys.argv):
            repeats = int(sys.argv[i + 1])
    spark = get_spark("gqprobe")
    spark.sparkContext.setLogLevel("ERROR")
    d = build(spark, n, 100)
    x = spark.read.parquet(f"{d}/x.parquet")

    names = [v for v in VARIANTS if only is None or v == only]
    # correctness cross-check via rounded checksum
    for base in ("gq6", "gq10"):
        subset = [v for v in names if v.startswith(base)]
        if len(subset) < 2:
            continue
        vals = {}
        for v in subset:
            fn, thresh = VARIANTS[v]
            if thresh:
                spark.conf.set(FALLBACK_KEY, str(thresh))
            df = fn(spark, x)
            cols = [c for c in df.columns if not c.startswith("id")]
            row = df.agg(
                F.round(sum(F.sum(F.col(c)) for c in cols), 3).alias("chk")
            ).first()
            if thresh:
                spark.conf.unset(FALLBACK_KEY)
            vals[v] = row["chk"]
        ref = vals[f"{base}_current"]
        for v, got in vals.items():
            print(("OK " if abs(got - ref) < 1e-3 else "MISMATCH") + f" {v} {got}")

    for v in names:
        fn, thresh = VARIANTS[v]
        if thresh:
            spark.conf.set(FALLBACK_KEY, str(thresh))
        fn(spark, x).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, x).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if thresh:
            spark.conf.unset(FALLBACK_KEY)
        print(
            f"{v}: best {min(runs):.3f}s median {statistics.median(runs):.3f}s"
            f" runs={['%.2f' % r for r in runs]}"
        )


if __name__ == "__main__":
    main()
