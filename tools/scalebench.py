"""sf1-equivalent bench point: FK-consistent 10× replication of the
sf0.1 testdata, then the 9 headline TPC-H queries timed against it.

Purpose (round-2 verdict #7): the per-query Spark constant floor (job
scheduling + AQE) dominates at sf0.1, making small-SF ratios vs the
reference's SF1 CSV baseline an upper bound. This tool produces the
direct comparison point: at sf≈1 the floor amortizes and the measured
Σ should sit well under the baseline's SF1 total.

Replication is FK-consistent — every replica r adds r*stride to each
table's primary key AND to every foreign key referencing it (customer/
supplier/part/orders/lineitem; nation/region copied) — so join
fan-outs, group cardinalities and selectivities match a true 10× scale,
not just the byte count.

Usage: python tools/scalebench.py [factor] [--fresh]
Writes one JSON line (same shape as bench.py) and SCALEBENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_python_spark.session import get_spark
from datafusion_python_spark.suite_tpch import TPCH_QUERIES
from datafusion_python_spark.tables import load_table

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
]

# table -> (primary key, {fk_col: referenced_table})
KEYS = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",  # composite with linenumber; orderkey stride suffices
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
}
COPY = ["nation", "region"]

# reference's SF1 CSV numbers (BASELINE.md <- benchmarks/tpch/README.md)
BASELINE_SF1 = {
    "tpch_q1": 2.9786,
    "tpch_q3": 2.9437,
    "tpch_q5": 3.5923,
    "tpch_q6": 1.6914,
    "tpch_q9": 4.2379,
    "tpch_q13": 1.0092,
    "tpch_q17": 5.1789,
    "tpch_q18": 4.1277,
    "tpch_q21": 8.0465,
}


def replicate(spark, base: str, out: str, factor: int) -> None:
    strides = {
        t: load_table(spark, base, t).agg(F.max(pk)).first()[0] + 1
        for t, (pk, _fks) in KEYS.items()
    }
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    for t, (pk, fks) in KEYS.items():
        df = load_table(spark, base, t).select("*", reps)
        df = df.withColumn(pk, F.col(pk) + F.col("rep") * F.lit(strides[t]))
        for fk, ref in fks.items():
            # lineitem's l_orderkey doubles as its FK to orders and is
            # already strided above as the "pk"
            df = df.withColumn(fk, F.col(fk) + F.col("rep") * F.lit(strides[ref]))
        df.drop("rep").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in COPY:
        src = f"{base}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    base = "/root/testdata/sf0.1"
    out = os.environ.get("SPARK_GRAFT_SCALEBENCH_DIR", "/tmp/scalebench_sf1")
    spark = get_spark("scalebench")

    if "--fresh" in sys.argv:
        shutil.rmtree(out, ignore_errors=True)
    if not os.path.isdir(f"{out}/lineitem.parquet"):
        replicate(spark, base, out, factor)

    n_li = spark.read.parquet(f"{out}/lineitem.parquet").count()
    print(f"lineitem rows: {n_li:,} (sf≈{factor * 0.1:g})", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = TPCH_QUERIES[name][0]
        fn(spark, out).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, out).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "scalebench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": round(factor * 0.1, 2),
        "lineitem_rows": n_li,
    }
    print(json.dumps(line))

    base_total = round(sum(BASELINE_SF1[q] for q in timings), 4)
    md = [
        f"# SCALEBENCH — sf≈{factor * 0.1:g} (FK-consistent {factor}× replication "
        "of sf0.1)",
        "",
        f"lineitem rows: {n_li:,}; best-of-3 per query, noop sink, "
        "local[32], session-default shuffle parallelism (32 — data-sized "
        "at this SF, unlike the small-SF bench profile).",
        "",
        "| query | this repo (s) | reference SF1 (s) | ratio |",
        "|---|---|---|---|",
    ]
    for q, s in timings.items():
        b = BASELINE_SF1[q]
        md.append(f"| {q} | {s} | {b} | {s / b:.2f}× |")
    md += [
        f"| **Σ (9 headline)** | **{total}** | **{base_total}** | "
        f"**{total / base_total:.2f}×** |",
        "",
        "Reference numbers: BASELINE.md (SF1, CSV, release — "
        "benchmarks/tpch/README.md). Parquet-vs-CSV favors this repo; the "
        "point of this table is the constant-floor claim from the round-2 "
        "verdict: at sf0.1 Spark's per-query floor dominates, at sf≈1 it "
        "amortizes and every ratio drops.",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALEBENCH.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
