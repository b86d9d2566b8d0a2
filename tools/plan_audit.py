"""Plan audit across every gate query: machine-generated scale evidence.

For each of the suite's queries at the given sf dir, inspect the
EXECUTED (AQE-final where available) plan and record:

- python_udf: any BatchEvalPython / ArrowEvalPython operator (the #1
  100 TB anti-pattern — must be zero everywhere);
- exchanges: shuffle count (Exchange hashpartitioning/rangepartitioning);
- broadcasts: BroadcastExchange count (dimension joins staying map-side);
- cartesian: CartesianProduct occurrences (hard failure — an all-pairs
  join at 100 TB); BroadcastNestedLoopJoin is counted separately: in
  this suite every BNLJ is a 1-row scalar-aggregate broadcast (corpus
  N / avgdl / thresholds) — a constant join, not a pair blowup — except
  the explicitly fenced exact=True oracle path of cosine_near_dup_pairs;
- pushed: whether any scan carries PushedFilters: [non-empty];
- topk_fused: TakeOrderedAndProject present (orderBy+limit fusion);
- codegen: WholeStageCodegen span count.

Usage: python tools/plan_audit.py [sf_dir] [--csv out.csv]
Prints a per-query table plus aggregate assertions; exits nonzero if a
Python UDF or an unexpected cartesian product appears anywhere.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_python_spark.session import get_spark
from datafusion_python_spark.suite import ALL_QUERIES

# region×nation style tiny cross joins that are legitimate by design
CARTESIAN_OK = {"agg_grouping_multi", "join_outer_cross"}


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "python_udf": bool(re.search(r"(Batch|Arrow)EvalPython", plan)),
        "exchanges": len(re.findall(r"Exchange (hash|range)partitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "cartesian": "CartesianProduct" in plan,
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "topk_fused": "TakeOrderedAndProject" in plan,
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")

    rows = []
    failures = []
    for name, (fn, _sql) in ALL_QUERIES.items():
        try:
            r = audit_one(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"build error: {str(ex)[:80]}"))
            continue
        r["query"] = name
        rows.append(r)
        if r["python_udf"]:
            failures.append((name, "PYTHON UDF IN PLAN"))
        if r["cartesian"] and name not in CARTESIAN_OK:
            failures.append((name, "unexpected cartesian/nested-loop join"))

    hdr = f"{'query':<26} {'exch':>4} {'bcast':>5} {'bnlj':>4} {'push':>4} {'topk':>4} {'wscg':>4}"
    print(hdr)
    for r in sorted(rows, key=lambda x: x["query"]):
        print(
            f"{r['query']:<26} {r['exchanges']:>4} {r['broadcasts']:>5} {r['bnlj']:>4} "
            f"{str(r['pushed'])[0]:>4} {str(r['topk_fused'])[0]:>4} {r['codegen']:>4}"
        )
    n = len(rows)
    print(
        f"\n{n} queries audited: 0 python-UDF plans"
        if not any(r["python_udf"] for r in rows)
        else "\nPYTHON UDFS PRESENT"
    )
    print(
        f"exchange stats: total {sum(r['exchanges'] for r in rows)}, "
        f"max {max(r['exchanges'] for r in rows)}, "
        f"broadcast joins {sum(r['broadcasts'] for r in rows)}"
    )
    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        sys.exit(1)


if __name__ == "__main__":
    main()
