"""Scale smoke: replicate lineitem/orders ~20× (≈12M lineitem rows,
sf≈2) into /tmp and run the heaviest query shapes, verifying runtime
scales roughly linearly and plans keep their shape (broadcast dims,
pushdown) at a data size 20× beyond the bench SF.

Usage: python tools/scalesmoke.py [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.session import get_spark
from datafusion_python_spark.tables import load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = "/root/testdata/sf0.1"
    out = "/tmp/scalesmoke"
    spark = get_spark("scalesmoke")

    if not os.path.isdir(f"{out}/lineitem.parquet"):
        shutil.rmtree(out, ignore_errors=True)
        reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        # stride must exceed the max base key or replicated keys collide and
        # silently corrupt FK joins (safe at any SF, not just sf0.1)
        stride = (
            load_table(spark, base, "orders").agg(F.max("o_orderkey")).first()[0] + 1
        )
        for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            df = load_table(spark, base, t)
            big = df.select("*", reps).withColumn(
                key, F.col(key) + F.col("rep") * F.lit(stride)
            ).drop("rep")
            big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        for t in ("customer", "supplier", "nation", "region", "part"):
            shutil.copytree(f"{base}/{t}.parquet", f"{out}/{t}.parquet") if os.path.isdir(
                f"{base}/{t}.parquet"
            ) else shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

    li = spark.read.parquet(f"{out}/lineitem.parquet")
    orders = spark.read.parquet(f"{out}/orders.parquet")
    part = spark.read.parquet(f"{out}/part.parquet")
    n = li.count()
    print(f"rows: lineitem={n:,}")

    def timed(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")

    # q1 shape
    timed(
        "q1-shape",
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.avg("l_discount"),
            F.count("*"),
        ),
    )
    # fact-fact join + dim broadcast (q9 shape)
    timed(
        "q9-shape",
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
    )
    # high-cardinality distinct
    timed("distinct-shape", li.select("l_orderkey").distinct().groupBy().count())


if __name__ == "__main__":
    main()
