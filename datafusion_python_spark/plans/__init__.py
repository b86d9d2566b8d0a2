"""Plan introspection: the reference's LogicalPlan/ExecutionPlan/metrics
surface (SURVEY §3.2, plan.py:140-382) over Spark's queryExecution."""

from .introspect import (
    execution_plan,
    explain_str,
    logical_plan,
    optimized_logical_plan,
    physical_join_strategies,
    pushed_filters,
    sql_metrics,
)

__all__ = [
    "logical_plan",
    "optimized_logical_plan",
    "execution_plan",
    "explain_str",
    "pushed_filters",
    "physical_join_strategies",
    "sql_metrics",
]
