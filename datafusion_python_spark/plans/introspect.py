"""Plan/metrics introspection over df._jdf.queryExecution().

ref: dataframe.py:1205-1252 (logical_plan/optimized_logical_plan/
execution_plan/explain) and plan.py:296-311 (per-operator MetricsSet —
output_rows, spill counts). Spark's executedPlan carries SQLMetrics per
operator; we surface them as plain dicts.
"""

from __future__ import annotations

import io
import contextlib
import re

from pyspark.sql import DataFrame


def _qe(df: DataFrame):
    return df._jdf.queryExecution()


def logical_plan(df: DataFrame) -> str:
    return _qe(df).logical().toString()


def optimized_logical_plan(df: DataFrame) -> str:
    return _qe(df).optimizedPlan().toString()


def execution_plan(df: DataFrame) -> str:
    return _qe(df).executedPlan().toString()


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the formatted plan — the check that a
    predicate actually reached the parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", explain_str(df))


def physical_join_strategies(df: DataFrame) -> list[str]:
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        explain_str(df),
    )


def sql_metrics(df: DataFrame) -> dict[str, dict[str, int]]:
    """Per-operator metrics after an action has run: {op: {metric: value}}.

    Equivalent of the reference's MetricsSet walk (plan.py:140-382);
    includes rows, spill bytes, shuffle sizes where the operator reports
    them.
    """
    plan = _qe(df).executedPlan()
    out: dict[str, dict[str, int]] = {}
    counter = [0]

    def kids(node):
        cls = node.getClass().getName()
        extra = []
        # AQE wrappers: descend into the materialized stage plans
        if cls.endswith("AdaptiveSparkPlanExec"):
            extra.append(node.executedPlan())
        elif cls.endswith("QueryStageExec") or "QueryStageExec" in cls:
            extra.append(node.plan())
        elif cls.endswith("ReusedExchangeExec"):
            extra.append(node.child())
        it = node.children().iterator()
        while it.hasNext():
            extra.append(it.next())
        return extra

    def walk(node):
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[str(kv._1())] = int(kv._2().value())
        counter[0] += 1
        out[f"{node.nodeName()}#{counter[0]}"] = metrics
        for c in kids(node):
            walk(c)

    try:
        walk(plan)
    except Exception:
        pass
    return out
