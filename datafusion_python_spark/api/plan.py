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


# in-process registry for plans that JVM serialization can't carry
# (file-scan relations hold live datasource objects) — see
# LogicalPlan.to_bytes
_PLAN_HANDLES: dict = {}


class LogicalPlan:
    """Wrapper over the Catalyst logical plan of a DataFrame
    (ref plan.py:40)."""

    def __init__(self, df) -> None:
        self._df = df

    def _df_render(self) -> tuple[str, str]:
        """(display, display_indent) in DataFusion's plan grammar — see
        plans/df_display.py."""
        from ..plans.df_display import render_logical
        from .expr_nodes import build_plan_env

        sdf = getattr(self._df, "df", self._df)
        env = build_plan_env(
            sdf._jdf.queryExecution().analyzed(), spark=sdf.sparkSession
        )
        return render_logical(self._variant_jplan(), env)

    def display(self) -> str:
        try:
            return self._df_render()[0]
        except Exception:
            return logical_plan(getattr(self._df, "df", self._df))

    def display_indent(self) -> str:
        try:
            return self._df_render()[1]
        except Exception:
            return self.display()

    def display_indent_schema(self) -> str:
        return self.display_indent()

    def spark_plan_text(self) -> str:
        """Catalyst's own rendering of this plan (engine-native view)."""
        return logical_plan(getattr(self._df, "df", self._df))

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
        """Serialized logical plan (ref LogicalPlan.to_bytes; the
        reference ships protobuf). JVM serialization when the plan is
        serializable; plans holding live datasource objects (file scans)
        fall back to a session-scoped HANDLE — fully round-trippable
        in-process, which is the reference codec's contract too."""
        sdf = getattr(self._df, "df", self._df)
        jvm = sdf.sparkSession._jvm
        try:
            return b"JVM0" + bytes(jvm.org.apache.spark.util.Utils.serialize(
                sdf._jdf.queryExecution().logical()
            ))
        except Exception:
            import uuid

            token = uuid.uuid4().hex
            _PLAN_HANDLES[token] = sdf
            return b"HDL0" + token.encode()

    @staticmethod
    def from_bytes(*args) -> "LogicalPlan":
        """Accepts ``from_bytes(data)`` or the reference's
        ``from_bytes(ctx, data)`` (ref plan.py LogicalPlan.from_bytes)."""
        data = args[-1]
        from ..session import get_spark

        spark = get_spark()
        if data[:4] == b"HDL0":
            sdf = _PLAN_HANDLES[data[4:].decode()]
            return LogicalPlan(sdf)
        if data[:4] == b"JVM0":
            data = data[4:]
        jvm = spark._jvm
        jplan = jvm.org.apache.spark.util.Utils.deserialize(data)
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, jplan
        )
        from pyspark.sql import DataFrame as SparkDF

        return LogicalPlan(SparkDF(jdf, spark))

    def to_proto(self) -> bytes:
        """Deprecated alias of to_bytes (ref plan.py to_proto)."""
        import warnings

        warnings.warn(
            "LogicalPlan.to_proto is deprecated; use to_bytes instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.to_bytes()

    @staticmethod
    def from_proto(ctx, data: bytes) -> "LogicalPlan":
        """Deprecated alias of from_bytes (ref plan.py from_proto)."""
        import warnings

        warnings.warn(
            "LogicalPlan.from_proto is deprecated; use from_bytes instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return LogicalPlan.from_bytes(ctx, data)

    def __repr__(self) -> str:
        return self.display()

    def __eq__(self, other) -> bool:  # ref LogicalPlan PartialEq
        if not isinstance(other, LogicalPlan):
            return NotImplemented
        try:
            return self.display_indent() == other.display_indent()
        except Exception:
            return self is other

    def __hash__(self) -> int:
        try:
            return hash(self.display_indent())
        except Exception:
            return id(self)


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
        try:
            return self._df_render()[0]
        except Exception:
            return self.optimized()

    def spark_plan_text(self) -> str:
        return optimized_logical_plan(getattr(self._df, "df", self._df))

    def _variant_jplan(self):
        sdf = getattr(self._df, "df", self._df)
        return sdf._jdf.queryExecution().optimizedPlan()


class ExecutionPlan:
    """Wrapper over the Spark physical plan (ref plan.py:140)."""

    def __init__(self, df) -> None:
        self._df = df

    def _df_render(self) -> tuple[str, str]:
        from ..plans.df_display import render_logical, render_physical
        from .expr_nodes import build_plan_env

        sdf = getattr(self._df, "df", self._df)
        qe = sdf._jdf.queryExecution()
        env = build_plan_env(qe.analyzed(), spark=sdf.sparkSession)
        # the analyzed tree carries the scan qualifier the physical
        # rendering reuses for aggregate/projection argument display
        from ..plans.df_display import _Renderer

        qual = _Renderer(qe.analyzed(), env).default_qualifier
        return render_physical(qe.executedPlan(), env, qualifier=qual)

    def display(self) -> str:
        ov = getattr(self, "_display_override", None)
        if ov is not None:
            return ov
        try:
            return self._df_render()[0]
        except Exception:
            return execution_plan(getattr(self._df, "df", self._df))

    def display_indent(self) -> str:
        try:
            return self._df_render()[1]
        except Exception:
            return self.display()

    def spark_plan_text(self) -> str:
        """Catalyst's own physical plan text (engine-native view)."""
        return execution_plan(getattr(self._df, "df", self._df))

    def __str__(self) -> str:
        return self.display()

    # Spark SQLMetric name → DataFusion metric name (what the
    # reference's metric tests look up)
    _METRIC_NAME_MAP = {
        "numOutputRows": "output_rows",
        "pipelineTime": "elapsed_compute",
        "aggTime": "elapsed_compute",
        "scanTime": "elapsed_compute",
        "collectTime": "elapsed_compute",
        "numSpills": "spill_count",
        "spillSize": "spilled_bytes",
        "numSpilledRows": "spilled_rows",
    }

    @classmethod
    def _df_metric_names(cls, m: dict) -> dict:
        out = dict(m)
        for k, v in m.items():
            alias = cls._METRIC_NAME_MAP.get(k)
            if alias and alias not in out:
                out[alias] = v
        return out

    def metrics(self) -> "MetricsSet | None":
        """MetricsSet for the ROOT operator (ref plan.py:211)."""
        all_ms = sql_metrics(getattr(self._df, "df", self._df))
        for _name, m in all_ms.items():
            return MetricsSet(self._df_metric_names(m))
        return None

    def collect_metrics(self) -> list:
        """Runtime statistics per operator, outermost first (ref
        plan.py:224): list of (description, MetricsSet). Streaming /
        partitioned collectors execute a derived plan; their observed
        totals surface as a StreamCollect pseudo-operator."""
        all_ms = sql_metrics(getattr(self._df, "df", self._df))
        out = [
            (name.rsplit("#", 1)[0], MetricsSet(self._df_metric_names(m)))
            for name, m in all_ms.items()
            if m
        ]
        observed = getattr(self._df, "_observed_metrics", None)
        if observed:
            out.append(("StreamCollect", MetricsSet(dict(observed))))
        return out

    def children(self) -> list["ExecutionPlan"]:
        """Child physical plans (ref ExecutionPlan.children) —
        display-only subtree views."""
        sdf = getattr(self._df, "df", self._df)
        jplan = sdf._jdf.queryExecution().executedPlan()
        kids = jplan.children()
        return [_JExecView(kids.apply(i)) for i in range(kids.size())]

    @property
    def partition_count(self) -> int:
        """Output partition count of the physical plan (ref
        partition_count — a property that is also callable for
        backward compatibility)."""
        sdf = getattr(self._df, "df", self._df)
        n = sdf.rdd.getNumPartitions()
        return _CallableInt(n)

    def display_graphviz(self) -> str:
        return _tree_to_dot(self.display(), "ExecutionPlan")

    def to_bytes(self) -> bytes:
        """Portable snapshot: JVM-serialized LOGICAL plan + the physical
        display text. Spark physical plans are executor-resident and not
        java-serializable pre-execution, so from_bytes re-plans the
        logical side and keeps the recorded display (ref plan.py
        ExecutionPlan.to_bytes — DataFusion ships protobuf instead)."""
        import base64
        import json

        logical = LogicalPlan(self._df).to_bytes()  # JVM or handle form
        payload = {
            "v": 1,
            "logical": base64.b64encode(logical).decode(),
            "display": self.display(),
        }
        return json.dumps(payload).encode()

    @staticmethod
    def from_bytes(*args) -> "ExecutionPlan":
        """Accepts ``from_bytes(data)`` or ``from_bytes(ctx, data)``."""
        import base64
        import json

        data = args[-1]
        payload = json.loads(data.decode())
        lp = LogicalPlan.from_bytes(base64.b64decode(payload["logical"]))
        out = ExecutionPlan(lp._df)
        out._display_override = payload.get("display")
        return out

    def to_proto(self) -> bytes:
        """Deprecated alias of to_bytes (ref plan.py to_proto)."""
        import warnings

        warnings.warn(
            "ExecutionPlan.to_proto is deprecated; use to_bytes instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.to_bytes()

    @staticmethod
    def from_proto(ctx, data: bytes) -> "ExecutionPlan":
        """Deprecated alias of from_bytes (ref plan.py from_proto)."""
        import warnings

        warnings.warn(
            "ExecutionPlan.from_proto is deprecated; use from_bytes instead",
            DeprecationWarning,
            stacklevel=2,
        )
        return ExecutionPlan.from_bytes(ctx, data)

    def __repr__(self) -> str:
        return self.display()


class _CallableInt(int):
    """int that tolerates legacy ``plan.partition_count()`` calls."""

    def __call__(self) -> int:
        return int(self)


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

    @property
    def partition_count(self) -> int:
        raise NotImplementedError("partition count is defined on the root plan")

    def metrics(self) -> "MetricsSet":
        return MetricsSet({})


# Spark SQLMetric key → DataFusion metric name (the reference exposes
# summed convenience properties, ref plan.py:262-324)
_METRIC_ALIASES = {
    "output_rows": ("numOutputRows", "number of output rows"),
    "elapsed_compute": ("aggTime", "time in aggregation build", "scanTime"),
    "spill_count": ("numSpills", "number of spills"),
    "spilled_bytes": ("spillSize", "memory spilled"),
    "spilled_rows": ("numSpilledRows",),
}


class MetricsSet:
    """Metrics of ONE operator (ref plan.py:262): convenience properties
    sum the underlying Spark SQLMetrics; dict form available via
    to_dict. Accepts either a flat {metric: value} dict (one operator)
    or the legacy {op: {metric: value}} nesting."""

    def __init__(self, metrics: dict) -> None:
        if metrics and all(isinstance(v, dict) for v in metrics.values()):
            # legacy nested form: flatten (single-operator expected)
            flat: dict = {}
            self._nested = dict(metrics)
            for m in metrics.values():
                flat.update(m)
            self._metrics = flat
        else:
            self._nested = None
            self._metrics = dict(metrics)

    def metrics(self) -> list["Metric"]:
        return [Metric(k, v) for k, v in self._metrics.items()]

    def sum_by_name(self, name: str):
        if name in self._metrics:
            # canonical name present (possibly as an alias of a Spark
            # metric) — it IS the value, don't re-sum its source keys
            return self._metrics[name]
        keys = _METRIC_ALIASES.get(name, (name,))
        vals = [v for k, v in self._metrics.items() if k in keys]
        return sum(vals) if vals else None

    @property
    def output_rows(self):
        return self.sum_by_name("output_rows")

    @property
    def elapsed_compute(self):
        return self.sum_by_name("elapsed_compute")

    @property
    def spill_count(self):
        return self.sum_by_name("spill_count")

    @property
    def spilled_bytes(self):
        return self.sum_by_name("spilled_bytes")

    @property
    def spilled_rows(self):
        return self.sum_by_name("spilled_rows")

    # legacy surface (earlier rounds of this package)
    def operators(self) -> list[str]:
        return list(self._nested) if self._nested else []

    def metrics_for(self, operator: str) -> list["Metric"]:
        src = (self._nested or {}).get(operator, {})
        return [Metric(k, v, operator=operator) for k, v in src.items()]

    def to_dict(self) -> dict:
        return dict(self._nested or self._metrics)

    def __repr__(self) -> str:
        return f"MetricsSet({len(self._metrics)} metrics)"


class Metric:
    """A single named metric value (ref plan.py:329)."""

    def __init__(self, name: str, value, operator: str | None = None) -> None:
        self.operator = operator
        self._name = name
        self._value = value

    @property
    def name(self) -> str:
        return self._name

    @property
    def value(self):
        # timestamp-valued metrics surface as datetimes (ref
        # Metric.value); Spark SQLMetrics are plain sums
        return self._value

    @property
    def value_as_datetime(self):
        import datetime as _dt

        try:
            if self._value and self._value > 10**12:
                return _dt.datetime.fromtimestamp(
                    self._value / 1000, tz=_dt.timezone.utc
                )
        except Exception:
            pass
        return None

    @property
    def partition(self):
        return None  # Spark SQLMetrics are pre-summed across partitions

    def labels(self) -> dict:
        return {}

    def __repr__(self) -> str:
        return f"Metric({self._name}={self._value})"
