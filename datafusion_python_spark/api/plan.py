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

    def _variant_jplan(self):
        sdf = getattr(self._df, "df", self._df)
        return sdf._jdf.queryExecution().analyzed()

    def to_variant(self):
        """Downcast to the matching plan-variant class (ref
        LogicalPlan.to_variant; see expr_nodes.py for the
        Catalyst↔DataFusion node mapping)."""
        from .expr_nodes import build_plan_env, plan_to_variant

        tagged = getattr(self._df, "_plan_variant", None)
        if tagged is not None:
            return tagged
        sdf = getattr(self._df, "df", self._df)
        # env (exprId → base relation) always comes from the analyzed
        # tree: the optimizer collapses the View nodes that carry the
        # base names, but exprIds are stable across optimization.
        env = build_plan_env(
            sdf._jdf.queryExecution().analyzed(), spark=sdf.sparkSession
        )
        return plan_to_variant(self._variant_jplan(), env)

    def display_graphviz(self) -> str:
        """DOT-format rendering of the logical operator tree (ref
        plan.py display_graphviz) — derived from the indent display."""
        return _tree_to_dot(self.display(), "LogicalPlan")

    def inputs(self) -> list["LogicalPlan"]:
        """Child plans (ref plan.py inputs). Catalyst children are
        display-only views — they wrap the same DataFrame but print the
        subtree (analyzed form, so to_variant keeps working down the
        tree)."""
        from .expr_nodes import build_plan_env

        sdf = getattr(self._df, "df", self._df)
        jplan = self._variant_jplan()
        # exprId → base-name env from the analyzed tree (views survive
        # there); the children walked are from this plan's own tree
        env = build_plan_env(
            sdf._jdf.queryExecution().analyzed(), spark=sdf.sparkSession
        )
        kids = jplan.children()
        out = []
        for i in range(kids.size()):
            v = _JPlanView(kids.apply(i))
            v._env = env
            out.append(v)
        return out

    def to_bytes(self) -> bytes:
        """JVM-serialized logical plan (ref LogicalPlan.to_bytes; the
        reference uses substrait protobuf — Spark's portable form is JVM
        serialization, restorable in-process via from_bytes)."""
        sdf = getattr(self._df, "df", self._df)
        jvm = sdf.sparkSession._jvm
        return bytes(jvm.org.apache.spark.util.Utils.serialize(
            sdf._jdf.queryExecution().logical()
        ))

    @staticmethod
    def from_bytes(data: bytes) -> "LogicalPlan":
        from ..session import get_spark

        spark = get_spark()
        jvm = spark._jvm
        jplan = jvm.org.apache.spark.util.Utils.deserialize(data)
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, jplan
        )
        from pyspark.sql import DataFrame as SparkDF

        return LogicalPlan(SparkDF(jdf, spark))

    def to_proto(self) -> bytes:
        raise NotImplementedError(
            "protobuf plan encoding is DataFusion-internal (datafusion-proto); "
            "use to_bytes (JVM serialization) or substrait tooling"
        )

    @staticmethod
    def from_proto(ctx, data: bytes) -> "LogicalPlan":
        raise NotImplementedError(
            "protobuf plan decoding is DataFusion-internal (datafusion-proto); "
            "use from_bytes (JVM serialization)"
        )

    def __repr__(self) -> str:
        return self.display()


class _JPlanView(LogicalPlan):
    """Subtree view over a raw Catalyst plan node (no DataFrame)."""

    def __init__(self, jplan) -> None:  # noqa: super-init-not-called
        self._jplan = jplan
        self._df = None
        self._env = None

    def display(self) -> str:
        return self._jplan.toString()

    def optimized(self) -> str:
        return self.display()

    def inputs(self) -> list["LogicalPlan"]:
        kids = self._jplan.children()
        out = []
        for i in range(kids.size()):
            v = _JPlanView(kids.apply(i))
            v._env = self._env
            out.append(v)
        return out

    def to_variant(self):
        from .expr_nodes import build_plan_env, plan_to_variant

        env = self._env or build_plan_env(self._jplan)
        return plan_to_variant(self._jplan, dict(env))

    def to_bytes(self) -> bytes:
        raise NotImplementedError("serialize the root plan, not a subtree view")


def _tree_to_dot(tree: str, label: str) -> str:
    """Convert an indent-style plan string into DOT digraph text."""
    lines = [ln for ln in tree.splitlines() if ln.strip()]
    nodes, edges, stack = [], [], []  # stack of (depth, node_id)
    for i, ln in enumerate(lines):
        depth = (len(ln) - len(ln.lstrip(" :+-"))) // 2
        name = ln.strip(" :+-").replace('"', "'")
        nodes.append(f'  n{i} [label="{name[:80]}"];')
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            edges.append(f"  n{stack[-1][1]} -> n{i};")
        stack.append((depth, i))
    body = "\n".join(nodes + edges)
    return f'digraph "{label}" {{\n{body}\n}}'


class OptimizedLogicalPlan(LogicalPlan):
    """LogicalPlan view rendering the Catalyst-optimized tree (what
    DataFrame.optimized_logical_plan returns, ref dataframe.py:1244)."""

    def display(self) -> str:
        return self.optimized()

    def _variant_jplan(self):
        sdf = getattr(self._df, "df", self._df)
        return sdf._jdf.queryExecution().optimizedPlan()


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

    collect_metrics = metrics  # ref plan.py collect_metrics alias

    def children(self) -> list["ExecutionPlan"]:
        """Child physical plans (ref ExecutionPlan.children) —
        display-only subtree views."""
        sdf = getattr(self._df, "df", self._df)
        jplan = sdf._jdf.queryExecution().executedPlan()
        kids = jplan.children()
        return [_JExecView(kids.apply(i)) for i in range(kids.size())]

    def partition_count(self) -> int:
        """Output partition count of the physical plan (ref
        partition_count)."""
        sdf = getattr(self._df, "df", self._df)
        return sdf.rdd.getNumPartitions()

    def display_graphviz(self) -> str:
        return _tree_to_dot(self.display(), "ExecutionPlan")

    def to_bytes(self) -> bytes:
        raise NotImplementedError(
            "physical plans are executor-resident JVM structures; serialize "
            "the logical plan (LogicalPlan.to_bytes) and re-plan on the "
            "receiving session"
        )

    @staticmethod
    def from_bytes(data: bytes) -> "ExecutionPlan":
        raise NotImplementedError(
            "physical plans are not portable; use LogicalPlan.from_bytes"
        )

    def to_proto(self) -> bytes:
        raise NotImplementedError(
            "protobuf plan encoding is DataFusion-internal (datafusion-proto)"
        )

    @staticmethod
    def from_proto(ctx, data: bytes) -> "ExecutionPlan":
        raise NotImplementedError(
            "protobuf plan decoding is DataFusion-internal (datafusion-proto)"
        )

    def __repr__(self) -> str:
        return self.display()


class _JExecView(ExecutionPlan):
    """Display-only view over a raw physical plan node."""

    def __init__(self, jplan) -> None:
        self._jplan = jplan
        self._df = None

    def display(self) -> str:
        return self._jplan.toString()

    def children(self) -> list["ExecutionPlan"]:
        kids = self._jplan.children()
        return [_JExecView(kids.apply(i)) for i in range(kids.size())]

    def partition_count(self) -> int:
        raise NotImplementedError("partition count is defined on the root plan")

    def metrics(self) -> "MetricsSet":
        return MetricsSet({})


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
