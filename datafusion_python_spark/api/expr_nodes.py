"""Logical-plan and expression *variant* classes behind ``to_variant()``.

Reference surface: python/datafusion/expr.py:85-200 re-exports ~80
Rust pyclasses (crates/core/src/expr/*.rs — Projection, Filter,
Aggregate, Column, Literal, BinaryExpr, InList, ...) that downcast a
DataFusion plan / expression enum into an inspectable node. The
Spark-native analogue downcasts *Catalyst* nodes: plan variants wrap
the analyzed (or optimized) JVM LogicalPlan node, expression variants
wrap either a resolved Catalyst ``Expression`` or an unresolved
``ColumnNode`` (what a standalone pyspark Column carries).

Shape-matching notes (verified against the reference's own tests,
tests/test_expr.py):

- DataFusion's SQL planner puts a ``Projection`` above every
  ``Aggregate``; Catalyst folds both into one ``Aggregate`` node. The
  dispatch therefore surfaces Catalyst's Aggregate as a Projection
  whose ``input()`` is the Aggregate variant — the reference plan
  shape, derived from the same node.
- A ``SubqueryAlias`` chain that only renames a leaf relation is
  DataFusion's ``TableScan``; one that wraps a recursive ``UnionLoop``
  is its ``RecursiveQuery``.
- ``GlobalLimit``/``LocalLimit``/``Offset`` triples collapse into one
  ``Limit`` variant (DataFusion keeps skip+fetch on a single node),
  and ``str(limit)`` renders the Rust Debug form the reference prints
  ("Skip: Some(Literal(Int64(5), None))").
- Column qualifiers: DataFusion's optimizer re-qualifies attributes by
  their *base table*; Catalyst keeps the innermost alias. The plan
  walk records exprId → base-relation-name so ``qualified_name()``
  reports the base table like the reference does.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Optional

__all__ = [
    "Aggregate",
    "AggregateFunction",
    "Alias",
    "Analyze",
    "Between",
    "BinaryExpr",
    "Case",
    "Cast",
    "Column",
    "CopyTo",
    "CreateCatalog",
    "CreateCatalogSchema",
    "CreateExternalTable",
    "CreateFunction",
    "CreateFunctionBody",
    "CreateIndex",
    "CreateMemoryTable",
    "CreateView",
    "Deallocate",
    "DescribeTable",
    "Distinct",
    "DmlStatement",
    "DropCatalogSchema",
    "DropFunction",
    "DropTable",
    "DropView",
    "EmptyRelation",
    "Execute",
    "Exists",
    "Explain",
    "Extension",
    "FileType",
    "Filter",
    "HigherOrderFunction",
    "ILike",
    "InList",
    "InSubquery",
    "IsFalse",
    "IsNotFalse",
    "IsNotNull",
    "IsNotTrue",
    "IsNotUnknown",
    "IsNull",
    "IsTrue",
    "IsUnknown",
    "Join",
    "JoinConstraint",
    "JoinType",
    "Lambda",
    "LambdaVariable",
    "Like",
    "Limit",
    "Literal",
    "Negative",
    "Not",
    "OperateFunctionArg",
    "Partitioning",
    "Placeholder",
    "Prepare",
    "Projection",
    "RecursiveQuery",
    "Repartition",
    "ScalarSubquery",
    "ScalarVariable",
    "SetVariable",
    "SimilarTo",
    "Sort",
    "Subquery",
    "SubqueryAlias",
    "TableScan",
    "TransactionAccessMode",
    "TransactionConclusion",
    "TransactionEnd",
    "TransactionIsolationLevel",
    "TransactionStart",
    "TryCast",
    "Union",
    "Unnest",
    "UnnestExpr",
    "Values",
    "WindowExpr",
    "expr_to_variant",
    "plan_to_variant",
    "build_plan_env",
]


# ---------------------------------------------------------------------------
# helpers

def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _simple(j) -> str:
    return j.getClass().getSimpleName().rstrip("$")


def _wrap_expr(jexpr, env):
    """Catalyst Expression → package Expr (usable + to_variant-able)."""
    from pyspark.sql.column import Column as SparkColumn

    from .expr import Expr, _active_jvm

    jvm = env.get("jvm") or _active_jvm()
    jcol = jvm.org.apache.spark.sql.classic.ExpressionUtils.column(jexpr)
    e = Expr(SparkColumn(jcol))
    e._variant_env = env
    return e


# Spark DataType simpleName → Arrow/DataFusion type-name (ref
# literal.rs:71 data_type() returns the arrow DataType Debug string).
_DT_NAMES = {
    "StringType": "Utf8",
    "IntegerType": "Int32",
    "LongType": "Int64",
    "ShortType": "Int16",
    "ByteType": "Int8",
    "DoubleType": "Float64",
    "FloatType": "Float32",
    "BooleanType": "Boolean",
    "BinaryType": "Binary",
    "DateType": "Date32",
    "NullType": "Null",
}


def _dt_name(jdt) -> str:
    nm = _simple(jdt)
    if nm in _DT_NAMES:
        return _DT_NAMES[nm]
    if nm == "DecimalType":
        return f"Decimal128({jdt.precision()}, {jdt.scale()})"
    if nm == "TimestampType":
        return 'Timestamp(Microsecond, Some("UTC"))'
    if nm == "TimestampNTZType":
        return "Timestamp(Microsecond, None)"
    return nm.removesuffix("Type")


def _rust_scalar_debug(value, dt_name: str) -> str:
    """Render a literal the way Rust Debug-prints ScalarValue — the
    format the reference's __repr__ / Display emit (e.g. Utf8("x"),
    Int64(5), Boolean(true))."""
    if value is None:
        return f"{dt_name}(NULL)"
    if dt_name == "Utf8":
        return f'Utf8("{value}")'
    if dt_name == "Boolean":
        return f"Boolean({str(bool(value)).lower()})"
    return f"{dt_name}({value})"


class _Variant:
    """Base for all variant classes: optional JVM node + env."""

    def __init__(self, jnode=None, env=None, **info) -> None:
        self._jnode = jnode
        self._env = env or {}
        self._info = info

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._info or ''})"


# ---------------------------------------------------------------------------
# expression variants

class Column(_Variant):
    """Resolved column reference (ref column.rs:48-58)."""

    def name(self) -> str:
        if "name" in self._info:
            return self._info["name"]
        n = self._jnode
        if _simple(n) == "UnresolvedAttribute":
            return n.name().split(".")[-1]
        return n.name()

    def relation(self) -> Optional[str]:
        if "relation" in self._info:
            return self._info["relation"]
        n = self._jnode
        if _simple(n) == "AttributeReference":
            base = self._env.get("base_by_exprid", {}).get(n.exprId().id())
            if base:
                return base
            q = n.qualifier()
            if q.size() > 0:
                return q.apply(q.size() - 1)
        return None

    def qualified_name(self) -> str:
        rel = self.relation()
        return f"{rel}.{self.name()}" if rel else self.name()

    def __repr__(self) -> str:
        return f"Column({self.qualified_name()})"


class Literal(_Variant):
    """Literal scalar (ref literal.rs:71-170). Exposes the arrow type
    name and the typed value_* accessor family."""

    def _value(self):
        if "value" in self._info:
            return self._info["value"]
        return self._jnode.value()

    def data_type(self) -> str:
        if "data_type" in self._info:
            return self._info["data_type"]
        nm = _dt_name(self._jnode.dataType())
        if nm == "Int32":
            # a bare Int32 literal can only come from Spark's SQL parser
            # (explicitly Int32-typed literals arrive wrapped in a cast);
            # DataFusion plans SQL integer literals as Int64
            return "Int64"
        return nm

    def _typed(self, *names):
        if self.data_type() not in names:
            raise ValueError(
                f"literal is {self.data_type()}, not one of {names}"
            )
        return self._value()

    def value_i8(self):
        return self._typed("Int8")

    def value_i16(self):
        return self._typed("Int16")

    def value_i32(self):
        return self._typed("Int32")

    def value_i64(self):
        # DataFusion SQL plans bare integer literals as Int64; accept
        # any integer width here (the reference raises only on
        # non-integer scalars).
        v = self._typed("Int8", "Int16", "Int32", "Int64")
        return int(v) if v is not None else None

    value_u8 = value_i8
    value_u16 = value_i16
    value_u32 = value_i32
    value_u64 = value_i64

    def value_f32(self):
        return self._typed("Float32")

    def value_f64(self):
        v = self._typed("Float32", "Float64")
        return float(v) if v is not None else None

    def value_bool(self):
        return self._typed("Boolean")

    def value_string(self):
        v = self._typed("Utf8")
        return str(v) if v is not None else None

    def value_date32(self):
        return self._typed("Date32")

    def value_date64(self):
        return self._typed("Date32", "Date64")

    def value_time64(self):
        return self._typed("Time64")

    def value_timestamp(self):
        dt = self.data_type()
        if not dt.startswith("Timestamp"):
            raise ValueError(f"literal is {dt}, not a timestamp")
        tz = "UTC" if "UTC" in dt else None
        return (self._value(), tz)

    def value_decimal128(self):
        dt = self.data_type()
        if not dt.startswith("Decimal128"):
            raise ValueError(f"literal is {dt}, not a decimal")
        p, s = dt[len("Decimal128("):-1].split(",")
        v = self._value()
        return (int(v) if v is not None else None, int(p), int(s))

    def into_type(self):
        return self.data_type()

    def __repr__(self) -> str:
        return _rust_scalar_debug(self._value(), self.data_type())


_BINARY_OPS = {
    # comparison
    "EqualTo": "=",
    "EqualNullSafe": "IS NOT DISTINCT FROM",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
    # arithmetic
    "Add": "+",
    "Subtract": "-",
    "Multiply": "*",
    "Divide": "/",
    "Remainder": "%",
    "Pmod": "%",
    # boolean
    "And": "AND",
    "Or": "OR",
    # bitwise / string
    "BitwiseAnd": "&",
    "BitwiseOr": "|",
    "BitwiseXor": "#",
    "ShiftLeft": "<<",
    "ShiftRight": ">>",
    "Concat": "||",
}

# unresolved ColumnNode function names (pyspark operator spellings)
_NODE_BINARY_OPS = {
    "=": "=", "==": "=", "<": "<", "<=": "<=", ">": ">", ">=": ">=",
    "!=": "!=", "<=>": "IS NOT DISTINCT FROM",
    "+": "+", "-": "-", "*": "*", "/": "/", "%": "%",
    "and": "AND", "or": "OR", "&": "&", "|": "|", "^": "#",
}


class BinaryExpr(_Variant):
    """left OP right (ref binary_expr.rs:49-61)."""

    def left(self):
        return self._info["left"]

    def right(self):
        return self._info["right"]

    def op(self) -> str:
        return self._info["op"]

    def __repr__(self) -> str:
        return f"BinaryExpr({self.left()!r} {self.op()} {self.right()!r})"


class Alias(_Variant):
    """expr AS name (ref alias.rs)."""

    def alias(self) -> str:
        return self._info["name"]

    name = alias

    def expr(self):
        return self._info["expr"]

    child = expr


class Cast(_Variant):
    def expr(self):
        return self._info["expr"]

    def data_type(self) -> str:
        return self._info["data_type"]


class TryCast(Cast):
    pass


class Not(_Variant):
    def expr(self):
        return self._info["expr"]


class Negative(Not):
    pass


class IsNull(Not):
    pass


class IsNotNull(Not):
    pass


class IsTrue(Not):
    pass


class IsFalse(Not):
    pass


class IsUnknown(Not):
    pass


class IsNotTrue(Not):
    pass


class IsNotFalse(Not):
    pass


class IsNotUnknown(Not):
    pass


class InList(_Variant):
    """expr IN (list) (ref in_list.rs:43-51)."""

    def expr(self):
        return self._info["expr"]

    def list(self) -> list:
        return self._info["list"]

    def negated(self) -> bool:
        return self._info.get("negated", False)


class Like(_Variant):
    def expr(self):
        return self._info["expr"]

    def pattern(self):
        return self._info.get("pattern")

    def negated(self) -> bool:
        return self._info.get("negated", False)

    def escape_char(self):
        return self._info.get("escape_char")

    def case_insensitive(self) -> bool:
        return self._info.get("case_insensitive", False)


class ILike(Like):
    pass


class SimilarTo(Like):
    pass


class Between(_Variant):
    def expr(self):
        return self._info["expr"]

    def low(self):
        return self._info.get("low")

    def high(self):
        return self._info.get("high")

    def negated(self) -> bool:
        return self._info.get("negated", False)


class Case(_Variant):
    def expr(self):
        return self._info.get("expr")

    def when_then_expr(self) -> list:
        return self._info.get("when_then", [])

    def else_expr(self):
        return self._info.get("else_expr")


class AggregateFunction(_Variant):
    """Aggregate call (ref aggregate_expr.rs:65-85)."""

    def aggregate_type(self) -> str:
        return self._info["name"]

    def is_distinct(self) -> bool:
        return self._info.get("distinct", False)

    def args(self) -> list:
        return self._info.get("args", [])

    def __repr__(self) -> str:
        return f"AggregateFunction({self.aggregate_type()})"


class WindowExpr(_Variant):
    """Window function call / plan node (ref window.rs)."""

    def window_func_name(self) -> str:
        return self._info.get("name", "")

    def window_expressions(self) -> list:
        return self._info.get("exprs", [])

    def input(self) -> list:
        return _child_plans(self._jnode, self._env)

    def inputs(self) -> list:
        return self.input()


class Exists(_Variant):
    def negated(self) -> bool:
        return self._info.get("negated", False)


class InSubquery(_Variant):
    def expr(self):
        return self._info.get("expr")

    def negated(self) -> bool:
        return self._info.get("negated", False)


class ScalarSubquery(_Variant):
    pass


class Placeholder(_Variant):
    def id(self) -> str:
        return self._info.get("id", "")


class ScalarVariable(_Variant):
    pass


class Lambda(_Variant):
    """Lambda body with bound parameters (ref lambda in expr bindings;
    Catalyst LambdaFunction)."""

    def params(self) -> list:
        return self._info.get("params", [])

    def body(self):
        return self._info.get("body")


class LambdaVariable(_Variant):
    def name(self) -> str:
        return self._info.get("name", "")


class HigherOrderFunction(_Variant):
    """transform/filter/... call carrying a Lambda argument."""

    def name(self) -> str:
        return self._info.get("name", "")

    def args(self) -> list:
        return self._info.get("args", [])


class UnnestExpr(_Variant):
    def expr(self):
        return self._info.get("expr")


# ---------------------------------------------------------------------------
# plan variants

def _child_plans(jplan, env) -> list:
    from .plan import _JPlanView

    kids = jplan.children()
    out = []
    for i in range(kids.size()):
        v = _JPlanView(kids.apply(i))
        v._env = env
        out.append(v)
    return out


class _PlanVariant(_Variant):
    def input(self) -> list:
        return _child_plans(self._jnode, self._env)

    def inputs(self) -> list:
        return self.input()

    def schema(self):
        from ..common import DFSchema

        try:
            return DFSchema.from_jplan(self._jnode)
        except Exception:
            return None

    def __name__(self) -> str:  # ref projection.rs:99
        return type(self).__name__

    def to_variant(self):
        return self

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class Projection(_PlanVariant):
    """SELECT list (ref projection.rs:76-99). Catalyst Project — or the
    projection face of a Catalyst Aggregate (see module docstring)."""

    def projections(self) -> list:
        if self._info.get("over_aggregate"):
            return [_wrap_expr(a, self._env) for a in _seq(self._jnode.output())]
        out = []
        for e in _seq(self._jnode.projectList()):
            # Catalyst auto-aliases every computed select item; DataFusion
            # only records aliases the user wrote — strip the implicit ones
            if _simple(e) == "Alias":
                auto = "__autoGeneratedAlias" in str(e.metadata())
                try:
                    auto = auto or str(e.name()) == str(e.child().sql())
                except Exception:
                    pass
                if auto:
                    e = e.child()
            out.append(_wrap_expr(e, self._env))
        return out

    def input(self) -> list:
        if self._info.get("over_aggregate"):
            from .plan import _JPlanView

            v = _JPlanView(self._jnode)
            v._env = dict(self._env, force_aggregate=True)
            return [v]
        return _child_plans(self._jnode, self._env)

    inputs = input


class Filter(_PlanVariant):
    def predicate(self):
        return _wrap_expr(self._jnode.condition(), self._env)


class Aggregate(_PlanVariant):
    """GROUP BY node (ref aggregate.rs:79-122). group_by_exprs are
    Catalyst groupingExpressions; aggregate_exprs are the
    AggregateExpression-bearing output expressions (DataFusion keeps
    the two lists disjoint)."""

    def group_by_exprs(self) -> list:
        return [_wrap_expr(e, self._env) for e in _seq(self._jnode.groupingExpressions())]

    def aggregate_exprs(self) -> list:
        out = []
        for e in _seq(self._jnode.aggregateExpressions()):
            inner = e.child() if _simple(e) == "Alias" else e
            if _contains_aggregate(inner):
                out.append(_wrap_expr(inner, self._env))
        return out

    def agg_expressions(self) -> list:
        return self.aggregate_exprs()

    def agg_func_name(self, expr) -> str:
        v = expr.to_variant() if hasattr(expr, "to_variant") else expr
        if isinstance(v, AggregateFunction):
            return v.aggregate_type()
        raise ValueError("not an aggregate expression")

    def aggregation_arguments(self, expr) -> list:
        v = expr.to_variant() if hasattr(expr, "to_variant") else expr
        if isinstance(v, AggregateFunction):
            return v.args()
        raise ValueError("not an aggregate expression")


def _contains_aggregate(jexpr) -> bool:
    if _simple(jexpr) == "AggregateExpression":
        return True
    kids = jexpr.children()
    return any(_contains_aggregate(kids.apply(i)) for i in range(kids.size()))


class Sort(_PlanVariant):
    def sort_exprs(self) -> list:
        from .expr import SortExpr as PySortExpr

        out = []
        for so in _seq(self._jnode.order()):
            e = _wrap_expr(so.child(), self._env)
            asc = _simple(so.direction()) == "Ascending"
            nf = "First" in _simple(so.nullOrdering())
            out.append(PySortExpr(e.expr, ascending=asc, nulls_first=nf))
        return out

    def get_fetch_val(self):
        return None


class Limit(_PlanVariant):
    """skip/fetch node (ref limit.rs). Catalyst splits this across
    GlobalLimit/LocalLimit/Offset; the dispatch collapses the stack and
    records skip+fetch here."""

    def skip(self):
        return self._info.get("skip")

    def fetch(self):
        return self._info.get("fetch")

    def input(self) -> list:
        from .plan import _JPlanView

        v = _JPlanView(self._info["input_jplan"])
        v._env = self._env
        return [v]

    inputs = input

    def _fmt(self, v):
        # Rust Debug of Option<Box<Expr>>
        if v is None:
            return "None"
        return f"Some(Literal(Int64({v}), None))"

    def __str__(self) -> str:
        return (
            f"Limit\nSkip: {self._fmt(self.skip())}\n"
            f"Fetch: {self._fmt(self.fetch())}"
        )

    __repr__ = __str__


class TableScan(_PlanVariant):
    """Leaf relation (ref table_scan.rs:80-153)."""

    def table_name(self) -> str:
        return self._info.get("name", "")

    def fqn(self):
        parts = self._info.get("name", "").split(".")
        while len(parts) < 3:
            parts.insert(0, None)
        return tuple(parts[-3:])

    def projections(self) -> list:
        return self._info.get("projections", [])

    def filters(self) -> list:
        return []

    def fetch(self):
        return None

    def input(self) -> list:
        return []

    inputs = input

    def __repr__(self) -> str:
        return f"TableScan(table_name={self.table_name()!r})"


class SubqueryAlias(_PlanVariant):
    def alias(self) -> str:
        return self._jnode.alias() if self._jnode is not None else self._info.get("alias", "")


class Join(_PlanVariant):
    def join_type(self) -> "JoinType":
        return JoinType(str(self._jnode.joinType().sql()).lower().replace(" ", ""))

    def join_constraint(self) -> "JoinConstraint":
        return JoinConstraint("on")

    def on(self) -> list:
        cond = self._jnode.condition()
        if cond.isDefined():
            return [_wrap_expr(cond.get(), self._env)]
        return []

    def filter(self):
        return None


class Union(_PlanVariant):
    pass


class Distinct(_PlanVariant):
    pass


class Repartition(_PlanVariant):
    def partitioning_scheme(self) -> "Partitioning":
        return Partitioning()

    def distribute_list(self) -> list:
        return []


class Partitioning(_Variant):
    pass


class Unnest(_PlanVariant):
    pass


class Values(_PlanVariant):
    pass


class EmptyRelation(_PlanVariant):
    def produce_one_row(self) -> bool:
        return self._info.get("one_row", False)


class RecursiveQuery(_PlanVariant):
    def name(self) -> str:
        return self._info.get("name", "")


class Subquery(_PlanVariant):
    pass


class Explain(_PlanVariant):
    pass


class Analyze(_PlanVariant):
    pass


class Extension(_PlanVariant):
    """Any plan node without a DataFusion counterpart (the reference
    uses Extension for user-defined nodes)."""

    def name(self) -> str:
        return self._info.get("name", "")

    def __repr__(self) -> str:
        return f"Extension({self.name()})"


# ---------------------------------------------------------------------------
# statement variants (DDL / DML / transactions). DataFusion builds these
# as plan nodes; Spark runs most as commands — the dispatch (or the
# SessionContext statement shims) tags them onto the DataFrame.

class _Statement(_PlanVariant):
    def input(self) -> list:
        return []

    inputs = input


class CopyTo(_Statement):
    def output_url(self) -> str:
        return self._info.get("url", "")

    def file_type(self) -> "FileType":
        return FileType(self._info.get("format", "parquet"))


class FileType(_Variant):
    def __init__(self, name: str = "parquet") -> None:
        super().__init__(info_name=name)
        self._name = name

    def __repr__(self) -> str:
        return self._name


class CreateIndex(_Statement):
    pass


class CreateMemoryTable(_Statement):
    def name(self) -> str:
        return self._info.get("name", "")


class CreateView(_Statement):
    def name(self) -> str:
        return self._info.get("name", "")


class CreateCatalog(_Statement):
    pass


class CreateCatalogSchema(_Statement):
    pass


class CreateExternalTable(_Statement):
    def name(self) -> str:
        return self._info.get("name", "")

    def locations(self) -> list[str]:
        return list(self._info.get("locations", []))

    def location(self) -> str:
        import warnings

        warnings.warn(
            "location() is deprecated; use locations() instead",
            DeprecationWarning,
            stacklevel=2,
        )
        locs = self.locations()
        return locs[0] if locs else ""


class CreateFunction(_Statement):
    pass


class CreateFunctionBody(_Variant):
    pass


class OperateFunctionArg(_Variant):
    pass


class DescribeTable(_Statement):
    pass


class DmlStatement(_Statement):
    def table_name(self) -> str:
        return self._info.get("name", "")


class DropTable(_Statement):
    pass


class DropView(_Statement):
    pass


class DropCatalogSchema(_Statement):
    pass


class DropFunction(_Statement):
    pass


class Deallocate(_Statement):
    pass


class Execute(_Statement):
    pass


class Prepare(_Statement):
    pass


class SetVariable(_Statement):
    pass


class TransactionStart(_Statement):
    pass


class TransactionEnd(_Statement):
    pass


class TransactionAccessMode(Enum):
    ReadOnly = "ReadOnly"
    ReadWrite = "ReadWrite"


class TransactionConclusion(Enum):
    Commit = "Commit"
    Rollback = "Rollback"


class TransactionIsolationLevel(Enum):
    ReadUncommitted = "ReadUncommitted"
    ReadCommitted = "ReadCommitted"
    RepeatableRead = "RepeatableRead"
    Serializable = "Serializable"


class JoinType(Enum):
    Inner = "inner"
    Left = "left"
    Right = "right"
    Full = "full"
    LeftSemi = "leftsemi"
    LeftAnti = "leftanti"
    LeftMark = "leftmark"

    @classmethod
    def _missing_(cls, value):
        aliases = {
            "join": cls.Inner, "innerjoin": cls.Inner,
            "leftouterjoin": cls.Left, "leftouter": cls.Left,
            "rightouterjoin": cls.Right, "rightouter": cls.Right,
            "fullouterjoin": cls.Full, "fullouter": cls.Full,
            "semi": cls.LeftSemi, "anti": cls.LeftAnti,
            "crossjoin": cls.Inner, "cross": cls.Inner,
        }
        return aliases.get(str(value).lower().replace(" ", ""))


class JoinConstraint(Enum):
    On = "on"
    Using = "using"


# ---------------------------------------------------------------------------
# dispatch: plans

_LEAFISH = {
    "LogicalRelation", "HiveTableRelation", "LogicalRDD",
    "DataSourceV2Relation", "Range", "OneRowRelation", "LocalRelation",
    "View", "StreamingRelation", "ExternalRDD",
}

_DML_NODES = {
    "InsertIntoStatement", "InsertIntoHadoopFsRelationCommand",
    "InsertIntoDataSourceCommand", "InsertIntoDataSourceDirCommand",
    "AppendData", "OverwriteByExpression", "OverwritePartitionsDynamic",
    "DeleteFromTable", "UpdateTable", "MergeIntoTable",
    "InsertIntoHiveTable",
}

_CREATE_TABLE_NODES = {
    "CreateTable", "CreateTableCommand", "CreateDataSourceTableCommand",
    "CreateDataSourceTableAsSelectCommand", "CreateTableAsSelect",
    "CreateHiveTableAsSelectCommand",
}


def _alias_chain_leaf(jplan):
    """If this subtree only renames a leaf relation (alias/view/
    repartition shells), return (base_name, leaf); else None. The
    DEEPEST name wins — DataFusion's TableScan reports the base table,
    not the outer query alias."""
    name = None
    node = jplan
    while True:
        nm = _simple(node)
        if nm == "SubqueryAlias":
            a = node.alias()
            name = a if isinstance(a, str) else str(a)
            node = node.child()
        elif nm == "View":
            # a View boundary IS the registered relation — whatever read
            # pipeline (reader casts, renames) sits below it belongs to
            # the table definition, so the chain terminates here
            name = node.desc().identifier().table()
            return name, node
        elif nm in ("Repartition", "RepartitionByExpression"):
            node = node.child()
        elif nm in _LEAFISH:
            return name, node
        else:
            return None


def _contains_node(jplan, names: set) -> bool:
    if _simple(jplan) in names:
        return True
    kids = jplan.children()
    return any(_contains_node(kids.apply(i), names) for i in range(kids.size()))


def _relation_name(jplan) -> str:
    nm = _simple(jplan)
    if nm == "LogicalRelation":
        ct = jplan.catalogTable()
        if ct.isDefined():
            return ct.get().identifier().table()
    if nm == "HiveTableRelation":
        return jplan.tableMeta().identifier().table()
    if nm == "View":
        return jplan.desc().identifier().table()
    return ""


def plan_to_variant(jplan, env=None):
    """Downcast a Catalyst logical plan node to its reference variant
    (ref LogicalPlan.to_variant, crates/core/src/sql/logical.rs)."""
    env = env or {}
    nm = _simple(jplan)
    if env.pop("force_aggregate", None):
        return Aggregate(jplan, env)
    if nm == "Project":
        return Projection(jplan, env)
    if nm == "Filter":
        return Filter(jplan, env)
    if nm == "Aggregate":
        return Projection(jplan, env, over_aggregate=True)
    if nm == "Sort":
        return Sort(jplan, env)
    if nm in ("GlobalLimit", "LocalLimit", "Offset"):
        skip = fetch = None
        node = jplan
        while True:
            knm = _simple(node)
            if knm in ("GlobalLimit", "LocalLimit"):
                try:
                    f = node.limitExpr().eval(None)
                    fetch = int(str(f))
                except Exception:
                    pass
                node = node.child()
            elif knm == "Offset":
                try:
                    skip = int(str(node.offsetExpr().eval(None)))
                except Exception:
                    pass
                node = node.child()
            else:
                break
        return Limit(jplan, env, skip=skip, fetch=fetch, input_jplan=node)
    if nm in ("Distinct", "Deduplicate"):
        return Distinct(jplan, env)
    if nm in ("Repartition", "RepartitionByExpression", "RebalancePartitions"):
        return Repartition(jplan, env)
    if nm in ("Union",):
        return Union(jplan, env)
    if nm in ("Join",):
        return Join(jplan, env)
    if nm in ("Window",):
        return WindowExpr(jplan, env)
    if nm in ("Generate",):
        return Unnest(jplan, env)
    if nm in ("UnionLoop",):
        return RecursiveQuery(jplan, env)
    if nm == "SubqueryAlias":
        if _contains_node(jplan, {"UnionLoop"}):
            return RecursiveQuery(jplan, env, name=str(jplan.alias()))
        leaf = _alias_chain_leaf(jplan)
        if leaf is not None:
            return TableScan(jplan, env, name=leaf[0] or _relation_name(leaf[1]))
        return SubqueryAlias(jplan, env)
    if nm in ("LocalRelation",):
        try:
            empty = jplan.data().isEmpty()
        except Exception:
            empty = False
        return EmptyRelation(jplan, env) if empty else Values(jplan, env)
    if nm == "OneRowRelation":
        return EmptyRelation(jplan, env, one_row=True)
    if nm in _LEAFISH:
        return TableScan(jplan, env, name=_relation_name(jplan))
    if nm in ("ExplainCommand",):
        return Explain(jplan, env)
    if nm in ("AnalyzeTableCommand", "AnalyzeColumnCommand"):
        return Analyze(jplan, env)
    if nm in ("DescribeTableCommand", "DescribeRelation", "DescribeColumn",
              "DescribeColumnCommand"):
        return DescribeTable(jplan, env)
    if nm in _DML_NODES:
        return DmlStatement(jplan, env)
    if nm in _CREATE_TABLE_NODES:
        return CreateMemoryTable(jplan, env)
    if nm in ("CreateViewCommand", "CreateTempViewUsing"):
        return CreateView(jplan, env)
    if nm in ("DropTableCommand", "DropTable"):
        return DropTable(jplan, env)
    if nm in ("SetCommand",):
        return SetVariable(jplan, env)
    if nm in ("WithCTE", "CTERelationDef", "CTERelationRef", "UnionLoopRef"):
        # structural CTE shells: surface as SubqueryAlias-ish wrappers
        return SubqueryAlias(jplan, env, alias=nm)
    return Extension(jplan, env, name=nm)


def build_plan_env(jplan, spark=None) -> dict:
    """One-pass env for a plan tree: exprId → base relation name (the
    qualifier DataFusion's optimizer reports — see module docstring)."""
    base: dict[int, str] = {}

    def walk(p):
        nm = _simple(p)
        rel = None
        if nm in ("View", "LogicalRelation", "HiveTableRelation"):
            rel = _relation_name(p)
        if rel:
            try:
                for a in _seq(p.output()):
                    base.setdefault(a.exprId().id(), rel)
            except Exception:
                pass
        kids = p.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    try:
        walk(jplan)
    except Exception:
        pass
    env = {"base_by_exprid": base}
    if spark is not None:
        env["jvm"] = spark._jvm
    return env


# ---------------------------------------------------------------------------
# dispatch: expressions

def _ev(jexpr, env):
    return _wrap_expr(jexpr, env)


def _catalyst_to_variant(jexpr, env):
    nm = _simple(jexpr)
    if nm == "AttributeReference" or nm == "UnresolvedAttribute":
        return Column(jexpr, env)
    if nm == "Literal":
        return Literal(jexpr, env)
    if nm == "Alias":
        if str(jexpr.name()) in ("literal", "cast"):
            # internal wrappers lit()/cast() add to carry the arrow-type
            # export tag — not user aliases; downcast to the payload
            return _catalyst_to_variant(jexpr.child(), env)
        return Alias(jexpr, env, name=jexpr.name(), expr=_ev(jexpr.child(), env))
    if nm in _BINARY_OPS:
        def _uncoerce(side):
            # Catalyst materializes comparison type-coercion as Cast
            # nodes around plain columns/literals; DataFusion's
            # unoptimized plan keeps the raw operands — unwrap those
            # analyzer-inserted casts (explicit casts of computed
            # expressions are untouched)
            if _simple(side) in ("Cast", "AnsiCast") and _simple(
                side.child()
            ) in ("AttributeReference", "Literal", "UnresolvedAttribute"):
                return side.child()
            return side

        return BinaryExpr(
            jexpr, env,
            left=_ev(_uncoerce(jexpr.left()), env),
            right=_ev(_uncoerce(jexpr.right()), env),
            op=_BINARY_OPS[nm],
        )
    if nm in ("In", "InSet"):
        if nm == "In":
            kids = _seq(jexpr.children())
            return InList(jexpr, env, expr=_ev(kids[0], env),
                          list=[_ev(k, env) for k in kids[1:]])
        return InList(jexpr, env, expr=_ev(jexpr.child(), env), list=[])
    if nm == "Not":
        child = jexpr.child()
        cv = _catalyst_to_variant(child, env)
        if isinstance(cv, InList):
            cv._info["negated"] = True
            return cv
        if isinstance(cv, Like):
            cv._info["negated"] = True
            return cv
        return Not(jexpr, env, expr=_ev(child, env))
    if nm == "UnaryMinus":
        return Negative(jexpr, env, expr=_ev(jexpr.child(), env))
    if nm == "IsNull":
        return IsNull(jexpr, env, expr=_ev(jexpr.child(), env))
    if nm == "IsNotNull":
        return IsNotNull(jexpr, env, expr=_ev(jexpr.child(), env))
    if nm in ("Like", "ILike", "RLike"):
        cls = {"Like": Like, "ILike": ILike, "RLike": SimilarTo}[nm]
        info = {"expr": _ev(jexpr.left(), env), "pattern": _ev(jexpr.right(), env)}
        if nm == "ILike":
            info["case_insensitive"] = True
        return cls(jexpr, env, **info)
    if nm == "CaseWhen":
        return Case(jexpr, env)
    if nm in ("Cast", "AnsiCast", "TryCast"):
        cls = TryCast if nm == "TryCast" else Cast
        try:
            if nm == "Cast" and "TRY" in str(jexpr.evalMode()):
                cls = TryCast
        except Exception:
            pass
        return cls(jexpr, env, expr=_ev(jexpr.child(), env),
                   data_type=_dt_name(jexpr.dataType()))
    if nm == "AggregateExpression":
        fn = jexpr.aggregateFunction()
        return AggregateFunction(
            jexpr, env,
            name=fn.prettyName(),
            distinct=bool(jexpr.isDistinct()),
            args=[_ev(a, env) for a in _seq(fn.children())],
        )
    if nm == "WindowExpression":
        return WindowExpr(jexpr, env, name=_simple(jexpr.windowFunction()))
    if nm == "ScalarSubquery":
        return ScalarSubquery(jexpr, env)
    if nm == "Exists":
        return Exists(jexpr, env)
    if nm == "InSubquery":
        return InSubquery(jexpr, env)
    if nm == "LambdaFunction":
        return Lambda(jexpr, env, body=_ev(jexpr.function(), env))
    if nm in ("NamedLambdaVariable", "UnresolvedNamedLambdaVariable"):
        try:
            name = jexpr.name()
        except Exception:
            name = str(jexpr)
        return LambdaVariable(jexpr, env, name=name)
    # higher-order function: any call carrying a LambdaFunction child
    kids = _seq(jexpr.children())
    if any(_simple(k) == "LambdaFunction" for k in kids):
        return HigherOrderFunction(jexpr, env, name=jexpr.prettyName(),
                                   args=[_ev(k, env) for k in kids])
    if nm == "Exp":  # misc scalar calls: fall through to generic below
        pass
    # generic scalar call — DataFusion downcasts to ScalarFunction,
    # which the reference does not export; surface as HigherOrderFunction
    # -shaped generic with the function name for introspection.
    try:
        name = jexpr.prettyName()
    except Exception:
        name = nm
    return HigherOrderFunction(jexpr, env, name=name,
                               args=[_ev(k, env) for k in kids])


_NODE_DT = {
    str: "Utf8", bool: "Boolean", int: "Int64", float: "Float64",
    bytes: "Binary", type(None): "Null",
}


def _node_to_variant(jnode, env):
    nm = _simple(jnode)
    if nm == "ExpressionColumnNode":
        return _catalyst_to_variant(jnode.expression(), env)
    if nm == "Literal":
        v = jnode.value()
        dt = None
        try:
            o = jnode.dataType()
            if o.isDefined():
                dt = _dt_name(o.get())
        except Exception:
            pass
        if dt is None:
            dt = _NODE_DT.get(type(v), type(v).__name__)
        return Literal(jnode, env, value=v, data_type=dt)
    if nm == "UnresolvedAttribute":
        try:
            parts = [p for p in _seq(jnode.nameParts())]
        except Exception:
            parts = str(jnode.sql()).split(".")
        name = parts[-1]
        rel = parts[-2] if len(parts) > 1 else None
        return Column(jnode, env, name=name, relation=rel)
    if nm == "Alias":
        try:
            name = jnode.name().apply(0)
        except Exception:
            name = str(jnode.sql()).rsplit(" AS ", 1)[-1].strip("`")
        if str(name) in ("literal", "cast"):
            # internal lit()/cast() wrappers carrying the arrow-type
            # export tag — not user aliases
            return _node_to_variant(jnode.child(), env)
        from pyspark.sql.column import Column as SparkColumn

        from .expr import Expr, _active_jvm

        jvm = env.get("jvm") or _active_jvm()
        child = Expr(SparkColumn(jvm.org.apache.spark.sql.Column(jnode.child())))
        return Alias(jnode, env, name=name, expr=child)
    if nm in ("UnresolvedFunction", "CaseWhenOtherwise"):
        from pyspark.sql.column import Column as SparkColumn

        from .expr import Expr, _active_jvm

        jvm = env.get("jvm") or _active_jvm()

        def arg(i):
            return Expr(SparkColumn(jvm.org.apache.spark.sql.Column(args.apply(i))))

        if nm == "CaseWhenOtherwise":
            return Case(jnode, env)
        fname = jnode.functionName()
        args = jnode.arguments()
        n = args.size()
        if fname in _NODE_BINARY_OPS and n == 2:
            return BinaryExpr(jnode, env, left=arg(0), right=arg(1),
                              op=_NODE_BINARY_OPS[fname])
        low = fname.lower()
        if low in ("not", "!") and n == 1:
            return Not(jnode, env, expr=arg(0))
        if low == "negative" and n == 1:
            return Negative(jnode, env, expr=arg(0))
        if low in ("isnull",) and n == 1:
            return IsNull(jnode, env, expr=arg(0))
        if low in ("isnotnull",) and n == 1:
            return IsNotNull(jnode, env, expr=arg(0))
        if low == "in":
            return InList(jnode, env, expr=arg(0),
                          list=[arg(i) for i in range(1, n)])
        if low in ("like", "ilike", "rlike"):
            cls = {"like": Like, "ilike": ILike, "rlike": SimilarTo}[low]
            return cls(jnode, env, expr=arg(0), pattern=arg(1))
        if low == "between" and n == 3:
            return Between(jnode, env, expr=arg(0), low=arg(1), high=arg(2))
        return HigherOrderFunction(jnode, env, name=fname,
                                   args=[arg(i) for i in range(n)])
    if nm == "Cast":
        child = jnode.child()
        if _simple(child) == "Literal":
            # lit() wraps Python ints in a bigint cast (DataFusion Int64
            # literal semantics) — present it as the Literal it is
            return Literal(
                jnode, env, value=child.value(), data_type=_dt_name(jnode.dataType())
            )
        return Cast(jnode, env, expr=None, data_type=_dt_name(jnode.dataType()))
    if nm in ("LambdaFunction",):
        return Lambda(jnode, env)
    if nm in ("UnresolvedNamedLambdaVariable", "NamedLambdaVariable"):
        return LambdaVariable(jnode, env, name=str(jnode))
    if nm == "SortOrder":
        return _node_to_variant(jnode.child(), env)
    raise NotImplementedError(f"to_variant: unsupported node {nm}")


def expr_to_variant(expr):
    """Entry point for Expr.to_variant() (ref expr.py Expr.to_variant)."""
    env = getattr(expr, "_variant_env", None) or {}
    node = expr._jnode()
    return _node_to_variant(node, env)
