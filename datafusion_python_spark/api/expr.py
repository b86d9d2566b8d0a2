"""Expr: the reference's expression tree, backed by pyspark Column.

Reference surface: python/datafusion/expr.py (Expr class :449, operator
overloads :658-832, predicates :898-972, sort :889, alias :877, builder
methods :1020-1074) and the Window/WindowFrame classes (:1570,:1594).

An Expr is an immutable wrapper over a Column; every method returns a
new Expr. Aggregate-builder state (distinct/filter/order_by) is carried
on the wrapper and consumed by functions.py when the aggregate is
finalized — mirroring the reference's ExprFuncBuilder.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import Window as SparkWindow
from pyspark.sql import types as T

__all__ = [
    "EXPR_TYPE_ERROR",
    "Expr",
    "CaseBuilder",
    "GroupingSet",
    "Window",
    "WindowFrame",
    "SortExpr",
    "col",
    "column",
    "lit",
    "literal",
]

# ref expr.py:77 — the canonical construction-error message
EXPR_TYPE_ERROR = "Use col()/column() or lit()/literal() to construct expressions"

_TYPE_ALIASES = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned Arrow types widen (SURVEY §1.3): u8→i16, u16→i32, u32→i64,
    # u64→decimal(20,0) — documented silent-overflow hazard
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(),
    "halffloat": T.FloatType(),  # pyarrow's str() name for float16
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "utf8": T.StringType(),
    "large_utf8": T.StringType(),
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "date32": T.DateType(),
    "date64": T.DateType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    # Spark DDL names (so string specs round-trip to real DataTypes)
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
}


def _spark_type(t: Any):
    """Accept Spark DataType, pyarrow DataType, or a name string."""
    if isinstance(t, T.DataType):
        return t
    try:
        import pyarrow as pa

        if isinstance(t, pa.DataType):
            if str(t) in _TYPE_ALIASES:
                return _TYPE_ALIASES[str(t)]
            from pyspark.sql.pandas.types import from_arrow_type

            return from_arrow_type(t)
    except ImportError:
        pass
    if isinstance(t, str):
        key = t.lower()
        if key in _TYPE_ALIASES:
            return _TYPE_ALIASES[key]
        return t  # let Spark's DDL parser handle it ("decimal(10,2)" etc.)
    # python types are accepted by the reference's cast (ref expr.py cast)
    _PY_TYPES = {str: T.StringType(), int: T.LongType(), float: T.DoubleType(), bool: T.BooleanType()}
    if t in _PY_TYPES:
        return _PY_TYPES[t]
    raise TypeError(f"unsupported type spec: {t!r}")


def _ensure_jvm() -> None:
    """DataFusion expressions are context-free; classic-PySpark Columns
    need a live JVM. Bootstrapping the shared session on first
    expression construction lets module-level expression building (a
    pattern all over the reference's test suite) work unchanged."""
    from pyspark import SparkContext

    if SparkContext._active_spark_context is None:
        from ..session import get_spark

        get_spark()


def _c(v: Any) -> Column:
    """Unwrap Expr | Column | python literal → Column."""
    if isinstance(v, Expr):
        return v.expr
    if isinstance(v, Column):
        return v
    _ensure_jvm()
    return F.lit(v)


def _rewrite_like_escape(pattern: str, escape: str | None) -> str:
    """Rewrite a LIKE pattern using a custom escape char into Spark's
    default backslash-escape form (ref: DataFusion expr/like.rs honors
    ``escape_char``; Spark's Column.like only understands ``\\``)."""
    if escape is None:
        return pattern
    if len(escape) != 1:
        raise ValueError(f"LIKE escape must be a single character, got {escape!r}")
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == escape and i + 1 < len(pattern):
            out.append("\\" + pattern[i + 1])
            i += 2
        elif ch == "\\":
            out.append("\\\\")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _e(c: Column) -> "Expr":
    return Expr(c)


def _active_jvm():
    """The live py4j JVM gateway — prefers the ipc worker context's
    session, else the active/default SparkSession."""
    from .ipc import get_worker_ctx

    ctx = get_worker_ctx()
    spark = getattr(ctx, "spark", None)
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    return spark._jvm


class Expr:
    """Expression wrapper (ref expr.py:449)."""

    def __init__(self, expr: Column) -> None:
        self.expr = expr
        # aggregate-builder state (ref expr.py:1020-1056)
        self._distinct: bool = False
        self._filter: Column | None = None
        self._order_by: list["SortExpr"] | None = None
        self._null_treatment: str | None = None
        # window-builder state (ref ExprFuncBuilder)
        self._partition_by: list[Column] | None = None
        self._window_frame: "WindowFrame" | None = None

    # -- python dunder surface -------------------------------------------
    def __repr__(self) -> str:
        # Literals render in the reference's Rust Debug form —
        # Expr(Utf8("x")) / Expr(Int64(5)) / Expr(List([1, 2, 3])) —
        # which its tests assert on (tests/test_expr.py).
        ro = getattr(self, "_repr_override", None)
        if ro is not None:
            return ro
        try:
            from .expr_nodes import Literal as _LitVariant

            v = self.to_variant()
            if isinstance(v, _LitVariant):
                return f"Expr({v!r})"
        except Exception:
            pass
        return f"Expr({self.expr})"

    def __add__(self, o): return _e(self.expr + _c(o))
    def __radd__(self, o): return _e(_c(o) + self.expr)
    def __sub__(self, o): return _e(self.expr - _c(o))
    def __rsub__(self, o): return _e(_c(o) - self.expr)
    def __mul__(self, o): return _e(self.expr * _c(o))
    def __rmul__(self, o): return _e(_c(o) * self.expr)
    def __truediv__(self, o): return _e(self.expr / _c(o))
    def __rtruediv__(self, o): return _e(_c(o) / self.expr)
    def __mod__(self, o): return _e(self.expr % _c(o))
    def __rmod__(self, o): return _e(_c(o) % self.expr)
    def __and__(self, o): return _e(self.expr & _c(o))
    def __rand__(self, o): return _e(_c(o) & self.expr)
    def __or__(self, o): return _e(self.expr | _c(o))
    def __ror__(self, o): return _e(_c(o) | self.expr)
    def __invert__(self): return _e(~self.expr)
    def __neg__(self): return _e(-self.expr)
    def __pow__(self, o): return _e(F.pow(self.expr, _c(o)))

    # ``expr == None`` means IS NULL in the reference (ref expr.py __eq__
    # None handling) — plain equality with a NULL literal never matches
    def __eq__(self, o):  # type: ignore[override]
        if o is None:
            return _e(self.expr.isNull())
        return _e(self.expr == _c(o))

    def __ne__(self, o):  # type: ignore[override]
        if o is None:
            return _e(self.expr.isNotNull())
        return _e(self.expr != _c(o))
    def __lt__(self, o): return _e(self.expr < _c(o))
    def __le__(self, o): return _e(self.expr <= _c(o))
    def __gt__(self, o): return _e(self.expr > _c(o))
    def __ge__(self, o): return _e(self.expr >= _c(o))

    def __getitem__(self, key):
        """Index into list/struct/map (ref expr.py:560 __getitem__).

        Int indexing is 0-based and yields NULL out of range (reference
        semantics) — try_element_at, not element_at, so ANSI mode does
        not raise on short arrays."""
        if isinstance(key, str):
            return _e(self.expr.getField(key))
        if isinstance(key, slice):
            # Python 0-based half-open → DataFusion array_slice 1-based
            # inclusive (ref expr.py:743-764)
            from . import functions as _fn

            start = 1 if key.start is None else (
                key.start + 1 if isinstance(key.start, int) else key.start + Expr(F.lit(1))
            )
            stop = key.stop  # inclusive bound == exclusive python stop
            if stop is None:
                stop = Expr(F.size(self.expr).cast("int"))
            return _fn.array_slice(self, start, stop, key.step)
        # DataFusion list indexing is 0-based; Spark element_at is 1-based
        return _e(
            F.try_element_at(
                self.expr,
                F.lit(key + 1 if isinstance(key, int) and key >= 0 else key),
            )
        )

    # NOTE: no __bool__ override — the reference Expr is a plain truthy
    # object (its tests rely on `assert expr_a == expr_b` passing by
    # truthiness of the comparison expression).

    def __iter__(self):
        # __getitem__ would otherwise make Expr silently iterable forever
        # (try_element_at never raises IndexError) — same guard as
        # pyspark's Column
        raise TypeError("Expr objects are not iterable")

    # -- naming / casting --------------------------------------------------
    def alias(self, name: str, metadata: dict | None = None) -> "Expr":
        gw = getattr(self, "_groups_window", None)
        if gw is not None:
            # keep the deferred GROUPS-frame marker; the alias applies
            # after DataFrame.select attaches the rewritten window
            out = Expr(self.expr)
            out._groups_window = gw
            out._groups_alias = (name, metadata)
            return out
        if not metadata:
            # re-aliasing must not drop the arrow-type export tag the
            # inner expression carries (lit()/cast() attach one)
            inherited = self._tag_metadata()
            if inherited:
                metadata = inherited
        if metadata:
            return _e(self.expr.alias(name, metadata=metadata))
        return _e(self.expr.alias(name))

    def _tag_metadata(self) -> dict | None:
        """The ARROW_LIT_META_KEY metadata of this expression's own alias
        node, if any."""
        try:
            n = self._jnode()
            if n.getClass().getSimpleName() != "Alias":
                return None
            import json as _json

            m = n.metadata()
            if hasattr(m, "isDefined"):  # scala Option[Metadata]
                if not m.isDefined():
                    return None
                m = m.get()
            md = _json.loads(str(m.json()))
            if ARROW_LIT_META_KEY in md:
                return {ARROW_LIT_META_KEY: md[ARROW_LIT_META_KEY]}
        except Exception:
            pass
        return None

    def _cast_impl(self, to: Any, try_: bool) -> "Expr":
        """Arrow target types Spark widens (s/ms/ns timestamps, float16,
        unsigned, views) cast to their storage type and carry the export
        tag so the declared type round-trips."""
        import pyarrow as pa

        if isinstance(to, pa.DataType) and not _arrow_type_faithful(to):
            import base64 as _b64

            storage = _storage_spark_type(to)
            c = self.expr.try_cast(storage) if try_ else self.expr.cast(storage)
            if pa.types.is_timestamp(to) and to.tz is None:
                c = c.cast(T.TimestampNTZType())
            tag = _b64.b64encode(
                pa.schema([pa.field("t", to)]).serialize().to_pybytes()
            ).decode()
            return _e(c.alias("cast", metadata={ARROW_LIT_META_KEY: tag}))
        target = _spark_type(to)
        return _e(self.expr.try_cast(target) if try_ else self.expr.cast(target))

    def cast(self, to: Any) -> "Expr":
        return self._cast_impl(to, try_=False)

    def try_cast(self, to: Any) -> "Expr":
        return self._cast_impl(to, try_=True)

    # -- predicates (ref expr.py:898-972) ---------------------------------
    def is_null(self) -> "Expr":
        return _e(self.expr.isNull())

    def is_not_null(self) -> "Expr":
        return _e(self.expr.isNotNull())

    def is_true(self) -> "Expr":
        return _e(self.expr == F.lit(True))

    def is_not_true(self) -> "Expr":
        return _e(~(self.expr.eqNullSafe(F.lit(True))))

    def is_false(self) -> "Expr":
        return _e(self.expr == F.lit(False))

    def is_not_false(self) -> "Expr":
        return _e(~(self.expr.eqNullSafe(F.lit(False))))

    def is_unknown(self) -> "Expr":
        return _e(self.expr.isNull())

    def is_not_unknown(self) -> "Expr":
        return _e(self.expr.isNotNull())

    def between(self, low: Any, high: Any, negated: bool = False) -> "Expr":
        out = self.expr.between(_c(low), _c(high))
        return _e(~out if negated else out)

    def in_list(self, values: Sequence[Any], negated: bool = False) -> "Expr":
        out = self.expr.isin([_c(v) if isinstance(v, (Expr, Column)) else v for v in values])
        return _e(~out if negated else out)

    def like(self, pattern: str, escape: str | None = None) -> "Expr":
        return _e(self.expr.like(_rewrite_like_escape(pattern, escape)))

    def ilike(self, pattern: str, escape: str | None = None) -> "Expr":
        return _e(self.expr.ilike(_rewrite_like_escape(pattern, escape)))

    def rex_match(self, pattern: str) -> "Expr":
        return _e(self.expr.rlike(pattern))

    # -- null handling ------------------------------------------------------
    def fill_null(self, value: Any) -> "Expr":
        return _e(F.coalesce(self.expr, _c(value)))

    def fill_nan(self, value: Any) -> "Expr":
        return _e(F.nanvl(self.expr, _c(value)))

    # -- sort keys (ref expr.py:889) ----------------------------------------
    def sort(self, ascending: bool = True, nulls_first: bool = True) -> "SortExpr":
        return SortExpr(self, ascending=ascending, nulls_first=nulls_first)

    def asc(self) -> "SortExpr":
        return self.sort(True)

    def desc(self) -> "SortExpr":
        # DataFusion's desc default keeps nulls_first=True, unlike Spark's
        # desc (nulls last) — SortExpr encodes it explicitly (SURVEY §2.6)
        return self.sort(False)

    # -- aggregate builder (ref expr.py:1020-1056) ----------------------------
    def distinct(self) -> "Expr":
        out = self._copy()
        out._distinct = True
        return out

    def filter(self, predicate: "Expr") -> "Expr":
        out = self._copy()
        out._filter = _c(predicate)
        return out

    def order_by(self, *sort_keys) -> "Expr":
        out = self._copy()
        out._order_by = [to_sort_expr(k) for k in sort_keys]
        return out

    def null_treatment(self, treatment: str) -> "Expr":
        out = self._copy()
        out._null_treatment = treatment
        return out

    def _copy(self) -> "Expr":
        out = Expr(self.expr)
        out._distinct = self._distinct
        out._filter = self._filter
        out._order_by = self._order_by
        out._null_treatment = self._null_treatment
        out._partition_by = getattr(self, "_partition_by", None)
        out._window_frame = getattr(self, "_window_frame", None)
        return out

    # -- window builder chain (ref expr.py:1056-1068, ExprFuncBuilder) --------
    def partition_by(self, *partition_by: "Expr") -> "Expr":
        """Builder form: set window partitioning; finish with ``build()``."""
        out = self._copy()
        out._partition_by = [_c(p) for p in partition_by]
        return out

    def window_frame(self, window_frame: "WindowFrame") -> "Expr":
        """Builder form: set the window frame; finish with ``build()``."""
        out = self._copy()
        out._window_frame = window_frame
        return out

    def build(self) -> "Expr":
        """Materialize a window expression from the builder chain
        (``expr.partition_by(...).order_by(...).window_frame(...).build()``
        — ref ExprFuncBuilder.build()). With no window state this returns
        the expression unchanged (aggregate-builder state is consumed by
        ``DataFrame.aggregate``)."""
        pb = getattr(self, "_partition_by", None)
        wf = getattr(self, "_window_frame", None)
        if pb is None and wf is None and self._order_by is None:
            return self
        w = Window(
            partition_by=[_e(c) for c in (pb or [])],
            order_by=self._order_by,
            window_frame=wf,
        )
        return self.over(w)  # routes GROUPS frames through the deferred marker

    # -- window attach (ref expr.py:1074 Expr.over) ---------------------------
    def over(self, window: "Window") -> "Expr":
        if getattr(self, "_over_fn", None) is not None:
            wf = window.window_frame
            if wf is None or wf.units != "groups":
                # value functions built without explicit partition/order
                # re-bind natively inside the window spec
                return self._over_fn(window)
        wf = window.window_frame
        if wf is not None and wf.units == "groups":
            # Defer: the GROUPS rewrite needs a dense_rank helper column
            # on the relation; DataFrame.select/window resolves the
            # marker (see WindowFrame docstring).
            out = Expr(self.expr)
            out._groups_window = window
            return out
        return _e(self.expr.over(window._to_spark()))

    # -- constructors (ref Expr.column / Expr.literal / Expr.string_literal) --
    @staticmethod
    def column(value: str) -> "Expr":
        _ensure_jvm()
        return Expr(F.col(value))

    @staticmethod
    def literal(value: Any, metadata: dict | None = None) -> "Expr":
        if isinstance(value, Expr):
            c = value.expr
        else:
            c = lit(value).expr  # handles pa.Scalar with type preservation
        if metadata:
            c = c.alias("literal", metadata=metadata)
        return Expr(c)

    @staticmethod
    def literal_with_metadata(value: Any, metadata: dict) -> "Expr":
        return Expr.literal(value, metadata=metadata)

    @staticmethod
    def string_literal(value: str) -> "Expr":
        return Expr.literal(str(value))

    # -- introspection (ref Expr.column_name/canonical_name/schema_name) ------
    # Spark 4's Column wraps a ColumnNode (Literal / UnresolvedAttribute /
    # UnresolvedFunction / Alias ...) — the classic-mode analogue of the
    # reference's Rust Expr variants.
    def _jnode(self):
        return self.expr._jc.node()

    def column_name(self, plan=None) -> str:
        """Output column name of this expression (the name a projection
        would produce). ``plan`` is accepted for reference signature
        compatibility; Spark resolves names from the expression itself."""
        try:
            n = self._jnode()
            if n.getClass().getSimpleName() == "Alias":
                return n.sql().rsplit(" AS ", 1)[-1]
            out = n.sql()
            import re as _re

            if _re.fullmatch(r"[\w.]+", out) and "." in out:
                # a qualified attribute path — the reference's
                # column_name is the unqualified field name
                return out.rsplit(".", 1)[-1]
            return out
        except Exception:
            return str(self.expr)

    def schema_name(self) -> str:
        """Name of this expression as it appears in a schema (ref
        expr.py schema_name — the node's SQL form)."""
        try:
            return self._jnode().sql()
        except Exception:
            return str(self.expr)

    def canonical_name(self) -> str:
        """Canonical form of the expression (ref canonical_name — the
        node's normalized display). Result ids (``#N``) are stripped so
        a serialization round trip compares equal."""
        try:
            import re as _re

            # strip result ids (#N) and JVM identity hashes (@hex) —
            # neither is part of the expression's canonical form
            return _re.sub(
                r"#\d+|@[0-9a-f]+", "", self._jnode().normalized().toString()
            )
        except Exception:
            try:
                return self._jnode().sql()
            except Exception:
                return str(self.expr)

    def rex_type(self):
        """Coarse expression kind (ref RexType): Literal, Reference
        (column), Alias, Call (function/operator), or Other."""
        from ..common import RexType

        try:
            n = self._jnode()
            if (
                n.getClass().getSimpleName() == "Cast"
                and n.child().getClass().getSimpleName() == "Literal"
            ):
                return RexType.Literal
            cls = n.getClass().getSimpleName()
        except Exception:
            return RexType.Other
        return {
            "Literal": RexType.Literal,
            "UnresolvedAttribute": RexType.Reference,
            "Alias": RexType.Alias,
            "UnresolvedFunction": RexType.Call,
            "CaseWhenOtherwise": RexType.Call,
            "Cast": RexType.Call,
            "SortOrder": RexType.Other,
        }.get(cls, RexType.Other)

    def rex_call_operator(self) -> str:
        """Operator/function name of a call expression (ref
        rex_call_operator)."""
        n = self._jnode()
        if n.getClass().getSimpleName() != "UnresolvedFunction":
            raise ValueError(f"not a function call: {self.expr}")
        return n.functionName()

    def rex_call_operands(self) -> list["Expr"]:
        """Child expressions of a call (ref rex_call_operands)."""
        from pyspark.sql.column import Column as _SparkColumn

        n = self._jnode()
        if n.getClass().getSimpleName() != "UnresolvedFunction":
            raise ValueError(f"not a function call: {self.expr}")
        jvm = _active_jvm()
        args = n.arguments()
        out = []
        for i in range(args.size()):
            out.append(Expr(_SparkColumn(jvm.org.apache.spark.sql.Column(args.apply(i)))))
        return out

    def python_value(self) -> Any:
        """Extract the Python value of a literal expression (ref
        python_value; raises ValueError for non-literals)."""
        n = self._jnode()
        # look through type-preserving wrappers lit()/cast() add around
        # the literal (metadata Alias, Int64-defaulting Cast)
        for _ in range(4):
            nm = n.getClass().getSimpleName()
            if nm in ("Cast", "Alias", "AnsiCast") and hasattr(n, "child"):
                n = n.child()
            else:
                break
        if n.getClass().getSimpleName() != "Literal":
            raise ValueError(f"not a literal expression: {self.expr}")
        return n.value()

    def variant_name(self) -> str:
        """Name of the underlying expression variant (ColumnNode class).
        The Int64-defaulting lit cast (see lit()) is transparent."""
        try:
            n = self._jnode()
            if (
                n.getClass().getSimpleName() == "Cast"
                and n.child().getClass().getSimpleName() == "Literal"
            ):
                return "Literal"
            return n.getClass().getSimpleName()
        except Exception:
            return type(self.expr).__name__

    def to_variant(self):
        """Downcast to the matching expression variant class (ref
        expr.py Expr.to_variant → Rust enum downcast). Dispatches on
        the underlying ColumnNode / Catalyst expression — see
        expr_nodes.py."""
        from .expr_nodes import expr_to_variant

        return expr_to_variant(self)

    def types(self):
        """Data type of this expression when derivable without a plan
        (literals); None otherwise (ref types() returns DataTypeMap)."""
        try:
            n = self._jnode()
            if n.getClass().getSimpleName() == "Literal":
                return n.dataType()
        except Exception:
            pass
        return None

    # -- serialization (ref Expr.to_bytes/from_bytes, ipc shipping) -----------
    def to_bytes(self, ctx=None) -> bytes:
        """Serialize for shipping to another process (round-trip via
        :meth:`from_bytes` / pickle). Expressions embedding a Python UDF
        use the reference's self-contained wire form — a raw
        ``DFPYUDF``-family frame (magic, frame version, python
        major/minor, cloudpickle payload) inside the container — unless
        the sender context disables inlining
        (``with_python_udf_inlining(enabled=False)``), in which case the
        UDF travels by NAME and the receiver resolves it from its
        registry. Plain expressions JVM-serialize their ColumnNode."""
        call = getattr(self, "_udf_call", None)
        if call is not None:
            return _encode_udf_call(call, ctx)
        import base64
        import json
        import sys as _sys

        jvm = _active_jvm()
        raw = bytes(jvm.org.apache.spark.util.Utils.serialize(self._jnode()))
        payload = {
            "v": 2,
            "py": list(_sys.version_info[:2]),
            "node": base64.b64encode(raw).decode(),
        }
        return json.dumps(payload).encode()

    @staticmethod
    def from_bytes(data: bytes, ctx=None):
        """Reconstruct an expression serialized by :meth:`to_bytes` on
        the receiving session (see :func:`..api.ipc.set_worker_ctx`)."""
        if data[:5] == _UDF_CONTAINER_MAGIC:
            return _decode_udf_call(data, ctx)
        import base64
        import json

        from pyspark.sql.column import Column as _SparkColumn

        payload = json.loads(data.decode())
        if payload.get("v") != 2:
            raise ValueError(f"unsupported expr payload version: {payload.get('v')}")
        jvm = _active_jvm()
        node = jvm.org.apache.spark.util.Utils.deserialize(
            base64.b64decode(payload["node"])
        )
        return Expr(_SparkColumn(jvm.org.apache.spark.sql.Column(node)))

    def __reduce__(self):
        from .ipc import get_sender_ctx

        return (_unpickle_expr, (self.to_bytes(get_sender_ctx()),))


class GroupingSet:
    """Factory for grouping-set expressions usable as the ``group_by``
    of :meth:`DataFrame.aggregate` (ref expr.py:1737-1860). On Spark
    these dispatch to the native ``rollup`` / ``cube`` /
    ``groupingSets`` relational operators — a single multi-level
    aggregation pass, same as DataFusion's."""

    @staticmethod
    def _mark(kind: str, payload) -> "Expr":
        e = Expr(F.lit(0))
        e._grouping_set = (kind, payload)
        return e

    @staticmethod
    def rollup(*exprs) -> "Expr":
        """``GROUP BY ROLLUP(a, b)`` — all prefixes (ref expr.py:1751)."""
        return GroupingSet._mark("rollup", [_c(col(e) if isinstance(e, str) else e) for e in exprs])

    @staticmethod
    def cube(*exprs) -> "Expr":
        """``GROUP BY CUBE(a, b)`` — all subsets (ref expr.py:1790)."""
        return GroupingSet._mark("cube", [_c(col(e) if isinstance(e, str) else e) for e in exprs])

    @staticmethod
    def grouping_sets(*expr_lists) -> "Expr":
        """Arbitrary ``GROUPING SETS ((..), (..))`` (ref expr.py:1841)."""
        sets = [
            [_c(col(e) if isinstance(e, str) else e) for e in lst]
            for lst in expr_lists
        ]
        return GroupingSet._mark("grouping_sets", sets)


class DeferredExpr(Expr):
    """Expression whose Spark Column depends on the enclosing frame's
    schema — type-directed functions (cast to the type OF another
    column, arrow_field introspection, unit-preserving temporal
    outputs). DataFrame.select resolves the builder against the frame;
    used outside a select, the placeholder column applies (the
    function's default behavior)."""

    def __init__(self, builder, placeholder: Column | None = None) -> None:
        super().__init__(placeholder if placeholder is not None else F.lit(None))
        self._builder = builder
        self._post: list[tuple] = []

    def _chain(self) -> "DeferredExpr":
        out = DeferredExpr(self._builder, self.expr)
        out._post = list(self._post)
        return out

    def alias(self, name: str, metadata: dict | None = None) -> "DeferredExpr":
        out = self._chain()
        out._post.append(("alias", name, metadata))
        return out

    def cast(self, to) -> "DeferredExpr":
        out = self._chain()
        out._post.append(("cast", to))
        return out

    def _resolve(self, sdf) -> Column:
        c = self._builder(sdf)
        for op in self._post:
            if op[0] == "alias":
                c = c.alias(op[1], metadata=op[2]) if op[2] else c.alias(op[1])
            elif op[0] == "cast":
                c = c.cast(_spark_type(op[1]))
        return c


class SortExpr:
    """A sort key: expression + direction + null placement (ref expr/sort_expr)."""

    def __init__(self, expr: Expr, ascending: bool = True, nulls_first: bool = True) -> None:
        self.inner = expr
        self.ascending = ascending
        self.nulls_first = nulls_first

    def _to_spark(self) -> Column:
        c = self.inner.expr
        if self.ascending:
            return c.asc_nulls_first() if self.nulls_first else c.asc_nulls_last()
        return c.desc_nulls_first() if self.nulls_first else c.desc_nulls_last()


def to_sort_expr(key) -> SortExpr:
    if isinstance(key, SortExpr):
        return key
    if isinstance(key, Expr):
        return SortExpr(key)
    if isinstance(key, str):
        return SortExpr(Expr(F.col(key)))
    raise TypeError(f"not a sort key: {key!r}")


class WindowFrame:
    """Window frame (ref expr.py:1594): units ∈ rows|range|groups.

    ``groups`` has no native Spark frame unit; it is emulated exactly by
    ranking peer groups — ``dense_rank()`` over the window's ORDER BY
    assigns each peer group a consecutive index, and a RANGE frame over
    that index with the same bounds selects precisely the GROUPS frame's
    rows (SURVEY §2.5). The rewrite needs a helper column, so it resolves
    when the expression reaches ``DataFrame.select``/``window``; a raw
    ``Window._to_spark()`` on a groups frame raises.
    """

    def __init__(self, units: str, start_bound: int | None, end_bound: int | None) -> None:
        units = units.lower()
        if units not in ("rows", "range", "groups"):
            # NotImplementedError to match the reference's error class
            raise NotImplementedError(f"invalid frame units: {units}")
        if units == "groups" and (start_bound is None or end_bound is None):
            # ref expr.py:1605-1608 — groups requires both bounds
            raise NotImplementedError(
                "groups frames require explicit start and end bounds"
            )
        self.units = units
        self.start_bound = start_bound
        self.end_bound = end_bound

    def _bounds(self) -> tuple[int, int]:
        lo = SparkWindow.unboundedPreceding if self.start_bound is None else -abs(self.start_bound)
        hi = SparkWindow.unboundedFollowing if self.end_bound is None else abs(self.end_bound)
        return lo, hi


class Window:
    """Window spec builder (ref expr.py:1570)."""

    def __init__(
        self,
        partition_by: list | None = None,
        window_frame: WindowFrame | None = None,
        order_by: list | None = None,
        null_treatment: str | None = None,
    ) -> None:
        def norm(x):
            # a bare Expr/SortExpr reads like a one-element list (ref)
            if x is None:
                return []
            return list(x) if isinstance(x, (list, tuple)) else [x]

        self.partition_by = norm(partition_by)
        self.order_by = norm(order_by)
        self.window_frame = window_frame
        self.null_treatment = null_treatment

    def _to_spark(self):
        if self.window_frame is not None and self.window_frame.units == "groups":
            raise NotImplementedError(
                "GROUPS frames resolve via DataFrame.select/window (the "
                "dense_rank helper column needs the relation); attach the "
                "expression with Expr.over and project it through the "
                "DataFrame wrapper"
            )
        spec = SparkWindow.partitionBy(
            *[F.col(p) if isinstance(p, str) else _c(p) for p in self.partition_by]
        )
        if self.order_by:
            spec = spec.orderBy(*[to_sort_expr(k)._to_spark() for k in self.order_by])
        if self.window_frame is not None:
            lo, hi = self.window_frame._bounds()
            if self.window_frame.units == "rows":
                spec = spec.rowsBetween(lo, hi)
            else:
                spec = spec.rangeBetween(lo, hi)
        return spec


class CaseBuilder:
    """case(expr).when(a,b).otherwise(c) builder (ref expr.py CaseBuilder)."""

    def __init__(self, base: Expr | None = None) -> None:
        self._base = base
        self._whens: list[tuple[Column, Column]] = []

    def when(self, condition_or_value, result) -> "CaseBuilder":
        if self._base is not None:
            cond = self._base.expr == _c(condition_or_value)
        else:
            cond = _c(condition_or_value)
        out = CaseBuilder(self._base)
        out._whens = self._whens + [(cond, _c(result))]
        return out

    @staticmethod
    def _kind(c: Column) -> str | None:
        """Coarse literal type class for eager CASE type-checking
        (DataFusion coerces at plan time and raises on mixed result
        types; Spark would silently coerce to string)."""
        try:
            n = c._jc.node()
            for _ in range(4):  # unwrap lit()'s Alias/Cast wrappers
                if n.getClass().getSimpleName() in ("Cast", "Alias", "AnsiCast"):
                    n = n.child()
                else:
                    break
            if n.getClass().getSimpleName() != "Literal":
                return None
            v = n.value()
        except Exception:
            return None
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, float)):
            return "num"
        if isinstance(v, str):
            return "str"
        return None

    def _check_types(self, extra: Column | None = None) -> None:
        kinds = {k for k in (
            [self._kind(res) for _, res in self._whens]
            + ([self._kind(extra)] if extra is not None else [])
        ) if k is not None}
        if len(kinds) > 1:
            raise ValueError(
                "CASE expression result branches have multiple data types "
                f"({', '.join(sorted(kinds))}); all WHEN/ELSE results must "
                "coerce to a common type"
            )

    def _finish(self, col: Column, extra: Column | None) -> Expr:
        # DataFusion unifies string CASE branches to Utf8View (string
        # literals plan as Utf8View) — tag the output so exports match
        kinds = {k for k in (
            [self._kind(res) for _, res in self._whens]
            + ([self._kind(extra)] if extra is not None else [])
        ) if k is not None}
        if kinds == {"str"}:
            return _e(_view_str_tagged(col, "case"))
        if kinds:
            return _e(col)
        # column-typed branches: view-ness resolves against the frame
        branches = [res for _, res in self._whens] + (
            [extra] if extra is not None else []
        )

        def build(sdf):
            import pyarrow as pa

            from .dataframe import DataFrame as _DF

            for b in branches:
                try:
                    t = _DF(sdf.select(b)).schema().field(0).type
                    if pa.types.is_string_view(t):
                        return _view_str_tagged(col, "case")
                except Exception:
                    continue
            return col

        return DeferredExpr(build, col)

    def otherwise(self, default) -> Expr:
        d = _c(default)
        self._check_types(d)
        col = None
        for cond, res in self._whens:
            col = F.when(cond, res) if col is None else col.when(cond, res)
        return self._finish(col.otherwise(d), d)

    def end(self) -> Expr:
        self._check_types()
        col = None
        for cond, res in self._whens:
            col = F.when(cond, res) if col is None else col.when(cond, res)
        return self._finish(col, None)


class _Col:
    """Column constructor supporting both call and attribute syntax:
    ``col("a")`` and ``col.a`` (ref col.py:23-41 Col class)."""

    def __call__(self, name: str) -> Expr:
        _ensure_jvm()
        return Expr(F.col(name))

    def __getattr__(self, name: str) -> Expr:
        if name.startswith("__"):  # dunder probes (pickle/copy/IPython)
            raise AttributeError(name)
        _ensure_jvm()
        return Expr(F.col(name))


col = _Col()
column = _Col()


def lit(value: Any) -> Expr:
    """Literal (ref expr.py:834). pyarrow Scalars are accepted and keep
    their EXACT Arrow type through collect/export (ref Expr.literal /
    tests/test_expr.py test_round_trip_pyscalar_value): types Spark
    represents natively pass straight through; the rest ride as their
    lossless storage encoding plus an ``__arrow_lit_type__`` field-
    metadata tag that DataFrame's Arrow export casts back."""
    import pyarrow as pa

    _ensure_jvm()
    if isinstance(value, pa.Scalar):
        return _lit_scalar(value)
    if not isinstance(value, pa.Array) and hasattr(value, "__arrow_c_array__"):
        # Arrow PyCapsule protocol objects (arro3 / nanoarrow scalars &
        # arrays): single-element payloads are scalars, else array lits
        arr = pa.array(value)
        if len(arr) == 1 and not hasattr(value, "__len__"):
            return _lit_scalar(arr[0])
        value = arr
    if isinstance(value, int) and not isinstance(value, bool):
        # DataFusion plans a bare Python int as Int64; Spark's lit makes
        # an Int32. The cast's Cast(Literal) node is transparently
        # unwrapped by python_value / to_variant.
        if -(2**63) <= value < 2**63:
            return Expr(F.lit(value).cast(T.LongType()))
        return Expr(F.lit(value))
    if isinstance(value, (list, tuple)):
        try:
            value = pa.array(value)
        except Exception:
            return Expr(F.lit(list(value)))
    if isinstance(value, pa.Array):
        e = _lit_scalar(pa.scalar(value.to_pylist(), type=pa.list_(value.type)))
        # the reference Debug-renders array literals as List([...])
        e._repr_override = f"Expr(List({value.to_pylist()}))"
        return e
    if isinstance(value, str):
        # DataFusion plans string literals as Utf8View (43+ default)
        import base64 as _b64

        tag = _b64.b64encode(
            pa.schema([pa.field("t", pa.string_view())]).serialize().to_pybytes()
        ).decode()
        return Expr(
            F.lit(value).alias("literal", metadata={ARROW_LIT_META_KEY: tag})
        )
    return Expr(F.lit(value))


# Arrow-literal fidelity helpers ------------------------------------------

ARROW_LIT_META_KEY = "__arrow_lit_type__"


def _view_str_tagged(col: Column, name: str) -> Column:
    """Tag a string column as Utf8View for export (DataFusion's string
    kernels/literals default to Utf8View since 43)."""
    import base64 as _b64

    import pyarrow as pa

    tag = _b64.b64encode(
        pa.schema([pa.field("t", pa.string_view())]).serialize().to_pybytes()
    ).decode()
    return col.alias(name, metadata={ARROW_LIT_META_KEY: tag})


def _expr_tag_type(e):
    """The declared Arrow type riding an expression's export tag, or
    None."""
    import base64 as _b64

    import pyarrow as pa

    if not isinstance(e, Expr):
        return None
    md = e._tag_metadata() or {}
    tag = md.get(ARROW_LIT_META_KEY)
    if not tag:
        return None
    try:
        return pa.ipc.read_schema(
            pa.BufferReader(_b64.b64decode(tag))
        ).field(0).type
    except Exception:
        return None


def _storage_spark_type(t):
    """Nearest Spark storage type for an arbitrary Arrow type (used with
    an ``__arrow_lit_type__`` tag so exports restore the exact type):
    float16→float, unsigned→wider signed, large/view→base, recursing
    through lists and structs."""
    import pyarrow as pa

    if not isinstance(t, pa.DataType):
        return _spark_type(t)
    key = str(t)
    if key in _TYPE_ALIASES:
        return _TYPE_ALIASES[key]
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_list_view(t) or pa.types.is_fixed_size_list(t):
        return T.ArrayType(_storage_spark_type(t.value_type))
    if pa.types.is_struct(t):
        return T.StructType([
            T.StructField(f.name, _storage_spark_type(f.type), f.nullable)
            for f in t
        ])
    if pa.types.is_map(t):
        return T.MapType(_storage_spark_type(t.key_type), _storage_spark_type(t.item_type))
    if pa.types.is_fixed_size_binary(t) or pa.types.is_large_binary(t) or pa.types.is_binary_view(t):
        return T.BinaryType()
    if pa.types.is_large_string(t) or pa.types.is_string_view(t):
        return T.StringType()
    if pa.types.is_timestamp(t):
        return T.TimestampType() if t.tz else T.TimestampNTZType()
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_duration(t):
        return T.DayTimeIntervalType()
    return _spark_type(t)


def _arrow_type_faithful(t) -> bool:
    """True when a Spark round-trip re-exports this Arrow type
    bit-identically (no metadata tag needed)."""
    import pyarrow as pa

    if pa.types.is_null(t) or pa.types.is_boolean(t) or pa.types.is_string(t):
        return True
    if pa.types.is_integer(t) and not pa.types.is_unsigned_integer(t):
        return True
    if pa.types.is_float32(t) or pa.types.is_float64(t):
        return True
    if pa.types.is_binary(t) or pa.types.is_date32(t):
        return True
    if pa.types.is_decimal128(t):
        return True
    if pa.types.is_timestamp(t) and t.unit == "us" and t.tz == "UTC":
        # naive µs goes through the tag path: F.lit(datetime) builds a
        # session-zoned TimestampType, which exports tz-aware
        return True
    if pa.types.is_list(t):
        return _arrow_type_faithful(t.value_type)
    if pa.types.is_struct(t):
        return all(_arrow_type_faithful(f.type) for f in t)
    if pa.types.is_map(t):
        return _arrow_type_faithful(t.key_type) and _arrow_type_faithful(t.item_type)
    return False


def _build_typed_lit(value, t) -> Column:
    """A Spark Column literal of the Spark type matching Arrow type
    ``t`` (recursive — F.lit alone can't build structs/maps)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_type

    if value is None:
        return F.lit(None).cast(from_arrow_type(t))
    if pa.types.is_struct(t):
        return F.struct(
            *[_build_typed_lit(value.get(f.name), f.type).alias(f.name) for f in t]
        )
    if pa.types.is_map(t):
        items = list(value.items()) if isinstance(value, dict) else list(value)
        if not items:
            return F.lit(None).cast(from_arrow_type(t))
        return F.map_from_arrays(
            F.array(*[_build_typed_lit(k, t.key_type) for k, _ in items]),
            F.array(*[_build_typed_lit(v, t.item_type) for _, v in items]),
        )
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        if not value:
            return F.lit([]).cast(
                from_arrow_type(pa.list_(t.value_type))
            )
        return F.array(*[_build_typed_lit(v, t.value_type) for v in value])
    return F.lit(value).cast(from_arrow_type(t))


def _lit_scalar(s) -> Expr:
    """pa.Scalar → Expr preserving the exact Arrow type (see lit)."""
    import base64

    import pyarrow as pa

    t = s.type
    if _arrow_type_faithful(t):
        return Expr(_build_typed_lit(s.as_py(), t))

    # storage encoding: a Spark-representable column whose export can be
    # cast back to the exact Arrow type by _restore_arrow_types
    v = s.as_py()
    if pa.types.is_unsigned_integer(t):
        if v is not None and int(v) > 2**63 - 1:
            col = F.lit(str(int(v)))  # uint64 beyond Java long: decimal string
        else:
            col = F.lit(int(v) if v is not None else None).cast("bigint")
    elif pa.types.is_decimal256(t):
        col = F.lit(str(v) if v is not None else None)
    elif pa.types.is_large_string(t) or pa.types.is_string_view(t):
        col = F.lit(v)
    elif pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t) or pa.types.is_binary_view(t):
        col = F.lit(bytes(v) if v is not None else None).cast("binary")
    elif pa.types.is_timestamp(t) and (
        t.unit != "ns" or s.value is None or int(s.value) % 1000 == 0
    ):
        # timestamps at µs-or-coarser precision live as real Spark
        # timestamps (NTZ for naive) — usable by every datetime
        # function; the tag restores the declared unit
        stored = F.lit(v)
        col = stored.cast("timestamp_ntz" if t.tz is None else "timestamp")
    elif pa.types.is_timestamp(t):
        # sub-µs nanoseconds don't fit Spark's µs timestamps: lossless
        # bigint storage (epoch ns), restored by the tag cast
        col = F.lit(int(s.value)).cast("bigint")
    elif (
        pa.types.is_date64(t)
        or pa.types.is_time32(t)
        or pa.types.is_time64(t)
        or pa.types.is_duration(t)
    ):
        raw = s.value  # epoch / midnight offset in the type's own unit
        col = F.lit(int(raw) if raw is not None else None).cast("bigint")
    elif pa.types.is_interval(t):  # month_day_nano
        mdn = s.value
        if mdn is None:
            col = F.lit(None).cast("struct<months:int,days:int,nanoseconds:bigint>")
        else:
            col = F.struct(
                F.lit(int(mdn.months)).cast("int").alias("months"),
                F.lit(int(mdn.days)).cast("int").alias("days"),
                F.lit(int(mdn.nanoseconds)).cast("bigint").alias("nanoseconds"),
            )
    elif pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        col = _build_typed_lit(v, pa.list_(t.value_type))
    else:
        # last resort: storage as the as_py value, restore by rebuild
        col = F.lit(v)

    tag = base64.b64encode(
        pa.schema([pa.field("t", t)]).serialize().to_pybytes()
    ).decode()
    return Expr(col.alias("literal", metadata={ARROW_LIT_META_KEY: tag}))


literal = lit


# ---------------------------------------------------------------------------
# Coercion helpers (ref expr.py:288-440): accepted by higher-level APIs so
# user code written against the reference's utilities keeps working.
def ensure_expr(value) -> Column:
    """Unwrap an Expr to its Spark Column; reject non-Expr values with
    the reference's canonical TypeError (ref expr.py:288 — strings are
    NOT coerced here, by design)."""
    if isinstance(value, Expr):
        return value.expr
    if isinstance(value, Column):
        return value
    raise TypeError(EXPR_TYPE_ERROR)


def ensure_expr_list(values) -> list[Column]:
    """ensure_expr over a possibly-nested iterable; string-likes are
    atomic (rejected), matching ref expr.py:313-341."""
    def _iter(items):
        for v in items:
            if isinstance(v, Iterable) and not isinstance(
                v, (Expr, str, bytes, bytearray)
            ):
                yield from _iter(v)
            else:
                yield ensure_expr(v)

    return list(_iter(values))


def coerce_to_expr(value) -> "Expr":
    """Wrap any value as an Expr: Expr passes through, everything else
    (including strings) becomes a LITERAL — ref expr.py:343-359."""
    if isinstance(value, Expr):
        return value
    if isinstance(value, Column):
        return Expr(value)
    return Expr.literal(value)


def coerce_to_expr_or_none(value):
    """coerce_to_expr, passing None through (ref coerce_to_expr_or_none)."""
    return None if value is None else coerce_to_expr(value)


def coerce_to_expr_list(values) -> list["Expr"]:
    """coerce_to_expr over a sequence; a lone value becomes a 1-list."""
    if isinstance(values, (Expr, Column, str)) or not hasattr(values, "__iter__"):
        values = [values]
    return [coerce_to_expr(v) for v in values]


def expr_list_to_raw_expr_list(values) -> list[Column] | None:
    """Spark Columns for a sequence of Expr/coercibles (ref
    expr_list_to_raw_expr_list); None passes through."""
    return None if values is None else [coerce_to_expr(v).expr for v in coerce_to_expr_list(values)]


def sort_or_default(e) -> Column:
    """A Spark sort Column from an Expr or SortExpr; bare expressions
    default to ascending nulls-first (ref sort_or_default)."""
    return to_sort_expr(e)._to_spark()


def sort_list_to_raw_sort_list(sort_list) -> list[Column] | None:
    """sort_or_default over a sequence (ref sort_list_to_raw_sort_list)."""
    if sort_list is None:
        return None
    if isinstance(sort_list, (Expr, SortExpr, str)):
        sort_list = [sort_list]
    return [sort_or_default(e) for e in sort_list]


# -- plan / expression variant classes (ref expr.py:85-200 re-exports) ----
# Imported last: expr_nodes imports Expr from this module at call time.
from .expr_nodes import *  # noqa: E402,F401,F403
from .expr_nodes import __all__ as _variant_all  # noqa: E402

# ``SortKey`` is a typing alias in the reference (expr.py:1734)
SortKey = Expr | SortExpr | str

__all__ = list(dict.fromkeys(__all__ + _variant_all + ["SortKey"]))


def _unpickle_expr(data: bytes):
    """Pickle entry point: decode with the receiving thread's worker
    context (ref ipc worker resolution)."""
    from .ipc import get_worker_ctx

    return Expr.from_bytes(data, ctx=get_worker_ctx())


# UDF wire codec (ref crates/core/src/codec.rs PY_*_UDF_FAMILY) ------------

_UDF_CONTAINER_MAGIC = b"DFXB2"
_UDF_FAMILY_MAGIC = {
    "udf": b"DFPYUDF",
    "udaf": b"DFPYUDAF",
    "udwf": b"DFPYUDWF",
}


def _inlining_enabled(ctx) -> bool:
    return getattr(ctx, "_udf_inlining", True) is not False


def _encode_udf_call(call, ctx) -> bytes:
    """Container layout: magic | u32 meta_len | json meta | raw frame.
    The frame (inline mode only) is ``<family magic> | version(1) |
    py_major(1) | py_minor(1) | cloudpickle(ctor args)`` — raw bytes, so
    the family magic is discoverable in the blob exactly like the
    reference's protobuf-embedded frames."""
    import base64
    import json
    import struct
    import sys as _sys

    kind, ctor, name, args = call
    meta: dict = {
        "kind": kind,
        "name": str(name),
        "args": [
            base64.b64encode(
                (a if isinstance(a, Expr) else Expr(_c(a))).to_bytes(ctx)
            ).decode()
            for a in args
        ],
    }
    frame = b""
    if _inlining_enabled(ctx):
        from pyspark import cloudpickle

        meta["inline"] = True
        frame = (
            _UDF_FAMILY_MAGIC[kind]
            + bytes([1, _sys.version_info[0], _sys.version_info[1]])
            + cloudpickle.dumps(ctor)
        )
    body = json.dumps(meta).encode()
    return _UDF_CONTAINER_MAGIC + struct.pack("<I", len(body)) + body + frame


def _decode_udf_call(data: bytes, ctx=None):
    import base64
    import json
    import struct
    import sys as _sys

    meta_len = struct.unpack("<I", data[5:9])[0]
    meta = json.loads(data[9 : 9 + meta_len].decode())
    frame = data[9 + meta_len :]
    kind, name = meta["kind"], meta["name"]
    args = [Expr.from_bytes(base64.b64decode(a), ctx) for a in meta["args"]]
    if meta.get("inline"):
        if ctx is not None and not _inlining_enabled(ctx):
            raise RuntimeError(
                "refusing inline Python UDF payload: inlining is disabled "
                "on the receiving context (register the UDF and use the "
                "by-name wire form)"
            )
        magic = _UDF_FAMILY_MAGIC[kind]
        off = len(magic)
        major, minor = frame[off + 1], frame[off + 2]
        if (major, minor) != tuple(_sys.version_info[:2]):
            raise RuntimeError(
                "Python UDF payload is not portable across Python minor "
                f"versions (encoded on {major}.{minor}, decoding on "
                f"{_sys.version_info[0]}.{_sys.version_info[1]})"
            )
        from pyspark import cloudpickle

        ctor = cloudpickle.loads(frame[off + 3 :])
        fn = _rebuild_udf(kind, ctor)
    else:
        resolver = ctx
        if resolver is None:
            from .ipc import get_worker_ctx

            resolver = get_worker_ctx()
        if resolver is None:
            raise RuntimeError(
                f"by-name Python UDF payload for {name!r} needs a "
                "receiving context with the UDF registered"
            )
        fn = getattr(resolver, kind)(name)
    return fn(*args)


def _rebuild_udf(kind: str, ctor):
    import importlib

    # `from . import udf` would resolve to the udf() FUNCTION re-exported
    # by the package namespace — load the module explicitly
    _udf_mod = importlib.import_module(__package__ + ".udf")

    if kind == "udf":
        return _udf_mod.ScalarUDF(*ctor)
    if kind == "udaf":
        return _udf_mod.AggregateUDF(*ctor)
    return _udf_mod.WindowUDF(*ctor)
