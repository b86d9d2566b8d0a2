"""Plan object surface (ref python/datafusion/plan.py:32-360).

The reference wraps DataFusion logical/physical plans in LogicalPlan /
ExecutionPlan objects with display methods and exposes per-operator
metrics. Here the same surface wraps Catalyst's query execution: plan
text from the JVM explain machinery, metrics from the executed plan's
SQLMetrics (AQE-aware walk in plans/introspect.py).
"""

from __future__ import annotations

from ..plans.introspect import (
    execution_plan,
    logical_plan,
    optimized_logical_plan,
    sql_metrics,
)


class LogicalPlan:
    """Wrapper over the Catalyst logical plan of a DataFrame
    (ref plan.py:40)."""

    def __init__(self, df) -> None:
        self._df = df

    def display(self) -> str:
        return logical_plan(getattr(self._df, "df", self._df))

    def display_indent(self) -> str:
        return self.display()

    def display_indent_schema(self) -> str:
        return self.display()

    def optimized(self) -> str:
        return optimized_logical_plan(getattr(self._df, "df", self._df))

    def to_variant(self):
        raise NotImplementedError(
            "to_variant exposes DataFusion's plan enum; use display() or "
            "the pyspark DataFrame's queryExecution via df.df"
        )

    def __repr__(self) -> str:
        return self.display()


class ExecutionPlan:
    """Wrapper over the Spark physical plan (ref plan.py:140)."""

    def __init__(self, df) -> None:
        self._df = df

    def display(self) -> str:
        return execution_plan(getattr(self._df, "df", self._df))

    def display_indent(self) -> str:
        return self.display()

    def metrics(self) -> "MetricsSet":
        return MetricsSet(sql_metrics(getattr(self._df, "df", self._df)))

    def __repr__(self) -> str:
        return self.display()


class MetricsSet:
    """Per-operator metric collection (ref plan.py:262)."""

    def __init__(self, metrics: dict) -> None:
        self._metrics = dict(metrics)

    def operators(self) -> list[str]:
        return list(self._metrics)

    def metrics_for(self, operator: str) -> list["Metric"]:
        return [Metric(operator, k, v) for k, v in self._metrics.get(operator, {}).items()]

    def to_dict(self) -> dict:
        return dict(self._metrics)

    def __repr__(self) -> str:
        return f"MetricsSet({len(self._metrics)} operators)"


class Metric:
    """A single named metric value (ref plan.py:329)."""

    def __init__(self, operator: str, name: str, value) -> None:
        self.operator = operator
        self.name = name
        self.value = value

    def __repr__(self) -> str:
        return f"Metric({self.operator}.{self.name}={self.value})"
