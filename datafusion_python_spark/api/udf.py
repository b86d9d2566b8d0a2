"""UDF / UDAF surface (ref python/datafusion/user_defined.py).

Scalar UDFs keep the reference contract — ``fn(*pa.Array) -> pa.Array``
(user_defined.py:128) — adapted onto Arrow-batched pandas_udf, so the
data crosses Python exactly once per batch, never per row.

UDAFs keep the Accumulator contract (state/update/merge/evaluate,
user_defined.py:358) and run distributed via applyInPandas when used
through ``DataFrame.aggregate``: partial accumulators per partition
would need a Scala Aggregator for true partial merge; this emulation
computes per-group in one pass (documented gap, SURVEY §2.12).
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .expr import Expr, _c, _spark_type, _storage_spark_type


def _default_name(col) -> str:
    """The column's own output name (so a metadata-carrying alias does
    not rename it)."""
    try:
        return str(col._jc.toString())
    except Exception:
        return "udf"


def _resolve_spark_type(t):
    """Spark type for a UDF return-type spec: pa.Field (the reference
    accepts fields for nullability), pa.DataType (incl. nested/ns types
    Spark widens — see _storage_spark_type), or a name string."""
    try:
        import pyarrow as pa

        if isinstance(t, pa.Field):
            t = t.type
        if isinstance(t, pa.DataType):
            return _storage_spark_type(t)
    except ImportError:
        pass
    return _spark_type(ScalarUDF._type_name(t))

__all__ = [
    "udf",
    "udaf",
    "udwf",
    "udtf",
    "ScalarUDF",
    "Accumulator",
    "AggregateUDF",
    "WindowEvaluator",
    "WindowUDF",
    "TableFunction",
]


def _pickle_module_by_value(obj) -> None:
    """Make the object's defining module pickle BY VALUE (pyspark's
    cloudpickle). User accumulator/evaluator classes often live in
    modules whose import re-runs driver-only code (the reference's own
    test files build expressions at module level); by-value pickling
    keeps Spark workers from importing them at all — matching the
    reference's self-contained UDF blobs (ref ipc/pickle codec)."""
    import sys

    mod = sys.modules.get(getattr(obj, "__module__", None) or "")
    if mod is None:
        return
    name = mod.__name__
    if name == "__main__" or name.startswith(
        ("datafusion", "pyspark", "pyarrow", "pandas", "numpy", "builtins")
    ):
        return
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass


class _CallableName(str):
    """The reference exposes ``udf.name()`` (a method); earlier rounds of
    this package exposed ``udf.name`` (an attribute). A callable str
    satisfies both calling conventions."""

    def __call__(self) -> str:
        return str(self)


class ScalarUDF:
    def __init__(self, fn: Callable, input_types, return_type, volatility: str = "immutable", name: str | None = None):
        self.fn = fn
        self.input_types = input_types
        self.return_type = return_type
        self.volatility = volatility
        self.name = _CallableName(
            name or getattr(fn, "__name__", type(fn).__name__)
        )
        _pickle_module_by_value(fn)

        spark_ret = _resolve_spark_type(return_type)

        def pandas_wrapper(*series: pd.Series) -> pd.Series:
            import pyarrow as pa

            arrays = [pa.Array.from_pandas(s) for s in series]
            out = fn(*arrays)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            return out.to_pandas()

        # the UDF's registered name must surface in expression displays /
        # canonical names (ref: canonical_name contains the udf name)
        pandas_wrapper.__name__ = str(self.name)
        self._pudf = F.pandas_udf(pandas_wrapper, returnType=spark_ret)
        if volatility == "volatile":
            self._pudf = self._pudf.asNondeterministic()

    @staticmethod
    def _type_name(t) -> str:
        try:
            import pyarrow as pa

            if isinstance(t, pa.Field):
                return str(t.type)
            if isinstance(t, pa.DataType):
                return str(t)
        except ImportError:
            pass
        return t if isinstance(t, str) else str(t)

    def __call__(self, *args) -> Expr:
        cols = [_c(a) for a in args]
        try:
            import pyarrow as pa

            in_types = self.input_types
            if isinstance(in_types, (pa.Field, pa.DataType)):
                in_types = [in_types]
            for i, t in enumerate(list(in_types or [])[: len(cols)]):
                if isinstance(t, pa.Field) and not t.nullable:
                    # declared non-nullable input: NULL data is a runtime
                    # validation error (arrow kernel semantics)
                    cols[i] = (
                        F.when(
                            cols[i].isNull(),
                            F.raise_error(
                                F.lit(
                                    "Invalid argument error: a null value was "
                                    f"passed to non-nullable argument {t.name!r} "
                                    f"of {self.name}"
                                )
                            ).cast(_resolve_spark_type(t)),
                        ).otherwise(cols[i])
                    )
        except Exception:
            pass
        out = self._pudf(*cols)
        try:
            import base64

            import pyarrow as pa

            from .expr import ARROW_LIT_META_KEY, _arrow_type_faithful

            rt = self.return_type
            if isinstance(rt, pa.Field) and (
                not rt.nullable or not _arrow_type_faithful(rt.type)
            ):
                # declared Field nullability/exact type rides the export
                # tag (Spark UDF results are always nullable)
                tag = base64.b64encode(
                    pa.schema([pa.field("t", rt.type, nullable=rt.nullable)])
                    .serialize()
                    .to_pybytes()
                ).decode()
                out = out.alias(
                    _default_name(out), metadata={ARROW_LIT_META_KEY: tag}
                )
            elif isinstance(rt, pa.DataType) and not _arrow_type_faithful(rt):
                tag = base64.b64encode(
                    pa.schema([pa.field("t", rt)]).serialize().to_pybytes()
                ).decode()
                out = out.alias(
                    _default_name(out), metadata={ARROW_LIT_META_KEY: tag}
                )
        except Exception:
            pass
        res = Expr(out)
        # wire-codec descriptor (see expr._encode_udf_call): ctor args +
        # the original argument expressions travel with the Expr
        res._udf_call = (
            "udf",
            (self.fn, self.input_types, self.return_type, self.volatility, str(self.name)),
            str(self.name),
            list(args),
        )
        return res

    def _register(self, spark) -> None:
        spark.udf.register(self.name, self._pudf)


def udf(*args, **kwargs):
    """``udf(fn, input_types, return_type, volatility, name)`` or decorator
    form ``@udf(input_types, return_type, volatility)`` (ref
    user_defined.py:128-356)."""
    if args and callable(args[0]):
        return ScalarUDF(args[0], *args[1:], **kwargs)

    def deco(fn):
        return ScalarUDF(fn, *args, **kwargs)

    return deco


import abc


class Accumulator(metaclass=abc.ABCMeta):
    """Subclass contract (ref user_defined.py:358): state / update /
    merge / evaluate over pyarrow values. ABC so missing overrides fail
    at instantiation with Python's standard message (the reference's
    tests assert on it)."""

    @abc.abstractmethod
    def state(self) -> list:
        ...

    @abc.abstractmethod
    def update(self, *values) -> None:
        ...

    @abc.abstractmethod
    def merge(self, states: list) -> None:
        ...

    @abc.abstractmethod
    def evaluate(self):
        ...


class AggregateUDF:
    def __init__(self, accum: Callable[[], Accumulator], input_types, return_type, state_type=None, volatility: str = "immutable", name: str | None = None):
        self.accum = accum
        self.input_types = input_types
        self.return_type = return_type
        self.name = _CallableName(name or getattr(accum, "__name__", "udaf"))
        _pickle_module_by_value(accum)
        self._spark_ret = _resolve_spark_type(return_type)
        self._grouped_agg_udf = None

    def apply_grouped(self, df, group_cols: list[str], value_cols: list[str], out_col: str):
        """Run the accumulator per group via applyInPandas (one shuffle on
        the group keys — the same topology a native UDAF would have)."""
        import pyarrow as pa

        accum_factory = self.accum
        ret_t = self._spark_ret
        schema = T.StructType(
            [df.df.schema[c] for c in group_cols] + [T.StructField(out_col, ret_t)]
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = accum_factory()
            arrays = [pa.Array.from_pandas(pdf[c]) for c in value_cols]
            acc.update(*arrays)
            result = acc.evaluate()
            val = result.as_py() if hasattr(result, "as_py") else result
            out = {c: [pdf[c].iloc[0]] for c in group_cols}
            out[out_col] = [val]
            return pd.DataFrame(out)

        from .dataframe import DataFrame as DF

        return DF(df.df.groupBy(*group_cols).applyInPandas(run, schema=schema))

    def __call__(self, *args) -> "_UdafCall":
        """Column-position call, usable directly inside
        ``DataFrame.aggregate(group_by, [my_udaf(col("x"))])`` — matches the
        reference's AggregateUDF.__call__ (ref user_defined.py:392).
        Routed through applyInPandas by DataFrame.aggregate.
        """
        return _UdafCall(self, list(args))

    def _grouped_agg(self):
        """Arrow GROUPED_AGG pandas_udf running the accumulator over each
        whole group — SQL-registrable and usable inside native
        ``groupBy().agg(...)``. Like ``apply_grouped``, each group arrives
        in one Arrow batch stream, so ``merge()`` is never needed (the
        documented partial-merge gap; a true partial-agg UDAF needs a
        Scala Aggregator)."""
        if self._grouped_agg_udf is None:
            import warnings

            import pyarrow as pa
            from pyspark.sql.functions import PandasUDFType

            accum_factory = self.accum

            def agg_fn(*series: pd.Series):
                acc = accum_factory()
                acc.update(*[pa.Array.from_pandas(s) for s in series])
                r = acc.evaluate()
                return r.as_py() if hasattr(r, "as_py") else r

            agg_fn.__name__ = str(self.name)
            with warnings.catch_warnings():  # legacy functionType= spelling
                warnings.simplefilter("ignore")
                self._grouped_agg_udf = F.pandas_udf(
                    agg_fn,
                    returnType=self._spark_ret,
                    functionType=PandasUDFType.GROUPED_AGG,
                )
        return self._grouped_agg_udf

    def _register(self, spark) -> None:
        """Name-based SQL registration (ref user_defined.py: udaf usable in
        SQL after ``ctx.register_udaf``): ``SELECT g, my_udaf(x) ... GROUP
        BY g`` runs the accumulator per group via Arrow."""
        spark.udf.register(self.name, self._grouped_agg())


class _UdafCall:
    """A pending UDAF invocation: (udf, arg columns, output alias).

    DataFrame.aggregate detects these among its aggs and evaluates them
    via applyInPandas (one shuffle on the group keys), joining with any
    native aggregates computed alongside.
    """

    def __init__(self, udf: AggregateUDF, args, alias: str | None = None) -> None:
        self.udf = udf
        self.args = args
        self.alias_name = alias or udf.name

    def alias(self, name: str) -> "_UdafCall":
        return _UdafCall(self.udf, self.args, name)

    def canonical_name(self) -> str:
        parts = []
        for a in self.args:
            try:
                parts.append((a if isinstance(a, Expr) else Expr(_c(a))).canonical_name())
            except Exception:
                parts.append(str(a))
        return f"{self.udf.name}({', '.join(parts)})"

    def to_bytes(self, ctx=None) -> bytes:
        from .expr import _encode_udf_call

        u = self.udf
        return _encode_udf_call(
            (
                "udaf",
                (u.accum, u.input_types, u.return_type, None, "immutable", str(u.name)),
                str(u.name),
                list(self.args),
            ),
            ctx,
        )

    def __reduce__(self):
        from .expr import _unpickle_expr
        from .ipc import get_sender_ctx

        return (_unpickle_expr, (self.to_bytes(get_sender_ctx()),))


def udaf(accum=None, input_types=None, return_type=None, state_type=None, volatility: str = "immutable", name: str | None = None):
    """ref user_defined.py:358-706. Three call forms:

    - ``udaf(AccumClass, input, ret, state, volatility=...)``
    - ``udaf(lambda: AccumClass(...), input, ret, state, ...)``
    - decorator: ``@udaf(input, ret, state, volatility)`` over a
      zero-arg factory function
    """
    import pyarrow as pa

    if isinstance(accum, (pa.DataType, list)) or accum is None:
        # decorator form: first positional is the input type
        dec_input, dec_ret, dec_state = accum, input_types, return_type
        dec_vol = state_type if isinstance(state_type, str) else volatility

        def decorator(fn):
            return AggregateUDF(fn, dec_input, dec_ret, dec_state, dec_vol, name or fn.__name__)

        return decorator
    if isinstance(accum, type) and not issubclass(accum, Accumulator):
        # duck-typed accumulators (full method surface) are accepted;
        # anything else is the reference's TypeError
        if not all(
            callable(getattr(accum, m, None))
            for m in ("state", "update", "merge", "evaluate")
        ):
            raise TypeError(
                f"`accum` must inherit from Accumulator, got {accum!r}"
            )
    out = AggregateUDF(accum, input_types, return_type, state_type, volatility, name)
    # probe-instantiate once so abstract-method errors surface at
    # definition time like the reference's (which validates eagerly)
    if isinstance(accum, type) and issubclass(accum, Accumulator):
        accum()
    return out


class WindowEvaluator:
    """UDWF contract (ref user_defined.py:709-1029): subclass and override
    ``evaluate_all(values: list[pa.Array], num_rows) -> pa.Array``.

    Spark has no native Python UDWF — emulation runs the evaluator per
    partition group via applyInPandas (SURVEY §2.12/§7.3): one shuffle on
    the partition keys, rows ordered within the group, evaluator output
    zipped back positionally.
    """

    def evaluate_all(self, values: list, num_rows: int):
        raise NotImplementedError

    # frame-aware single-range evaluation (bounded frames)
    def evaluate(self, values: list, eval_range: tuple[int, int]):
        raise NotImplementedError

    # rank-aware evaluation: ranked is a list of (start, stop) runs of
    # order-key ties in sorted order (ref user_defined.py evaluate_all_with_rank)
    def evaluate_all_with_rank(self, num_rows: int, ranked: list):
        raise NotImplementedError

    def supports_bounded_execution(self) -> bool:
        return False

    def memoize(self) -> None:
        """Hook called after each input batch so fixed-start-frame
        evaluators (first_value/nth_value) can drop consumed input
        (ref user_defined.py:727). Default: no-op."""
        return None

    def get_range(self, idx: int, num_rows: int) -> tuple[int, int]:
        """Required input range for row ``idx`` during stateful
        execution when ``uses_window_frame()`` is false (ref
        user_defined.py:739). Default: the current row only."""
        return (idx, idx)

    def is_causal(self) -> bool:
        """Whether the evaluator never needs future rows (ref
        user_defined.py:757)."""
        return False

    def uses_window_frame(self) -> bool:
        return False

    def include_rank(self) -> bool:
        return False


class WindowUDF:
    def __init__(self, evaluator: Callable[[], WindowEvaluator], input_types, return_type, volatility: str = "immutable", name: str | None = None):
        self.evaluator = evaluator
        self.input_types = input_types
        self.return_type = return_type
        self.name = _CallableName(name or getattr(evaluator, "__name__", "udwf"))
        self._spark_ret = _resolve_spark_type(return_type)
        _pickle_module_by_value(evaluator)

    def __call__(self, *args) -> "_UdwfCall":
        """Start the window expression-builder chain (ref
        user_defined.py WindowUDF.__call__)."""
        return _UdwfCall(self, args)

    def apply(
        self,
        df,
        partition_by: list[str],
        order_by: list[str],
        input_cols: list[str],
        out_col: str,
        frame: tuple[int | None, int | None] | None = None,
    ):
        """Append the window column: shuffle on partition keys, sort within
        group, run the evaluator per group.

        Dispatch mirrors the reference's evaluator modes
        (user_defined.py:709-1029):
        - ``uses_window_frame()`` → per-row ``evaluate(values, (start, stop))``
          over a rows frame; ``frame`` is (preceding, following) row offsets
          with None = unbounded (matches WindowFrame(rows) semantics).
        - ``include_rank()`` → ``evaluate_all_with_rank(n, ranked)`` where
          ranked holds the (start, stop) runs of order-key ties.
        - otherwise → one ``evaluate_all(values, n)`` per group.
        """
        import pyarrow as pa

        factory = self.evaluator
        ret_t = self._spark_ret
        schema = T.StructType(list(df.df.schema.fields) + [T.StructField(out_col, ret_t)])

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_by, kind="mergesort") if order_by else pdf
            ev = factory()
            n = len(pdf)
            arrays = [pa.Array.from_pandas(pdf[c]) for c in input_cols]
            if ev.uses_window_frame():
                lo, hi = frame if frame is not None else (None, None)
                out_vals = []
                for i in range(n):
                    s = 0 if lo is None else max(0, i - lo)
                    e = n if hi is None else min(n, i + hi + 1)
                    r = ev.evaluate(arrays, (s, e))
                    out_vals.append(r.as_py() if hasattr(r, "as_py") else r)
                vals = pd.Series(out_vals)
            elif ev.supports_bounded_execution():
                # ref user_defined.py: bounded evaluators run evaluate()
                # per row over their self-declared get_range (inclusive
                # bounds, frame ignored)
                out_vals = []
                for i in range(n):
                    r = ev.evaluate(arrays, ev.get_range(i, n))
                    out_vals.append(r.as_py() if hasattr(r, "as_py") else r)
                vals = pd.Series(out_vals)
            elif ev.include_rank():
                ranked = []
                if order_by:
                    keys = pdf[order_by].itertuples(index=False, name=None)
                    prev, start = None, 0
                    for i, k in enumerate(keys):
                        if prev is not None and k != prev:
                            ranked.append((start, i))
                            start = i
                        prev = k
                    ranked.append((start, n))
                else:
                    ranked = [(0, n)] if n else []
                out = ev.evaluate_all_with_rank(n, ranked)
                vals = out.to_pandas() if hasattr(out, "to_pandas") else pd.Series(list(out))
            else:
                out = ev.evaluate_all(arrays, n)
                vals = out.to_pandas() if hasattr(out, "to_pandas") else pd.Series(list(out))
            pdf = pdf.copy()
            pdf[out_col] = vals.values
            return pdf

        from .dataframe import DataFrame as DF

        out = df.df.groupBy(*partition_by).applyInPandas(run, schema=schema)
        # declared Arrow return types Spark can't hold natively (uint64
        # etc.) ride the metadata channel so exports restore them
        try:
            import base64

            import pyarrow as pa

            from .expr import ARROW_LIT_META_KEY, _arrow_type_faithful

            ret_arrow = self.return_type
            if isinstance(ret_arrow, pa.DataType) and not _arrow_type_faithful(ret_arrow):
                tag = base64.b64encode(
                    pa.schema([pa.field("t", ret_arrow)]).serialize().to_pybytes()
                ).decode()
                out = out.withMetadata(out_col, {ARROW_LIT_META_KEY: tag})
        except Exception:
            pass
        return DF(out)


class _UdwfCall:
    """A pending UDWF invocation built through the reference's
    expression-builder chain (ref user_defined.py WindowUDF.__call__ →
    builder → build()). DataFrame.select detects these and evaluates
    them via WindowUDF.apply (applyInPandas)."""

    def __init__(self, udf, args, frame=None, partition=None, order=None, alias=None):
        self.udf = udf
        self.args = list(args)
        self.frame = frame
        self.partition = list(partition or [])
        self.order = list(order or [])
        self.alias_name = alias
        self.post: list = []  # Column→Column transforms applied after eval

    def canonical_name(self) -> str:
        parts = []
        for a in self.args:
            try:
                parts.append((a if isinstance(a, Expr) else Expr(_c(a))).canonical_name())
            except Exception:
                parts.append(str(a))
        return f"{self.udf.name}({', '.join(parts)})"

    def to_bytes(self, ctx=None) -> bytes:
        from .expr import _encode_udf_call

        u = self.udf
        return _encode_udf_call(
            (
                "udwf",
                (u.evaluator, u.input_types, u.return_type, "immutable", str(u.name)),
                str(u.name),
                list(self.args),
            ),
            ctx,
        )

    def __reduce__(self):
        from .expr import _unpickle_expr
        from .ipc import get_sender_ctx

        return (_unpickle_expr, (self.to_bytes(get_sender_ctx()),))

    def _copy(self, **kw):
        out = _UdwfCall(self.udf, self.args, self.frame, self.partition,
                        self.order, self.alias_name)
        out.post = list(self.post)
        for k, v in kw.items():
            setattr(out, k, v)
        return out

    def with_post(self, fn):
        """Wrap the evaluated window column in a scalar transform (lets
        udwf results compose inside scalar functions, e.g.
        ``f.round(my_udwf(col), 3)``)."""
        out = self._copy()
        out.post = self.post + [fn]
        return out

    def window_frame(self, wf):
        return self._copy(frame=wf)

    def partition_by(self, *cols):
        return self._copy(partition=list(cols))

    def order_by(self, *keys):
        return self._copy(order=list(keys))

    def build(self):
        return self

    def alias(self, name: str):
        return self._copy(alias_name=name)


def udwf(evaluator=None, input_types=None, return_type=None, volatility: str = "immutable", name: str | None = None):
    """ref user_defined.py:709. Forms:

    - ``udwf(EvaluatorClass | factory, input, ret, volatility=...)``
    - decorator ``@udwf([input], ret, "volatility")`` over a factory
    """
    import pyarrow as pa

    if evaluator is None or isinstance(evaluator, (pa.DataType, list)):
        dec_in, dec_ret = evaluator, input_types
        dec_vol = return_type if isinstance(return_type, str) else volatility

        def deco(fn):
            return WindowUDF(fn, dec_in, dec_ret, dec_vol, name or fn.__name__)

        return deco
    if isinstance(evaluator, type) and not issubclass(evaluator, WindowEvaluator):
        raise TypeError(
            "`func` must implement the abstract base class WindowEvaluator"
        )
    return WindowUDF(evaluator, input_types, return_type, volatility, name)


class SparkTableFunction:
    """Spark-native row-generating Python UDTF: a class with an ``eval``
    yielding rows, registered for SQL ``SELECT * FROM fn(...)`` via
    Spark 3.5+ Python UDTFs (executor-side, beyond-parity surface)."""

    def __init__(self, cls, return_type: str, name: str | None = None):
        from pyspark.sql.functions import udtf as spark_udtf

        self.name = _CallableName(name or cls.__name__)
        self._udtf = spark_udtf(cls, returnType=return_type)

    def __call__(self, *args):
        return self._udtf(*[_c(a) for a in args])

    def _register(self, spark) -> None:
        spark.udtf.register(self.name, self._udtf)


def TableFunction(name, func=None, ctx=None, *, with_session: bool = False):
    """Reference TableFunction constructor (ref user_defined.py:1124):
    ``TableFunction(name, func, ctx=None, with_session=False)`` →
    planning-time table function."""
    return PyTableFunction(func, name, with_session)


class PyTableFunction:
    """Reference-style table function (ref user_defined.py:1124
    TableFunction, crates/core/src/udtf.rs): a Python callable invoked
    at PLANNING time with literal Exprs, returning a Table / pyarrow
    dataset. SQL calls (``SELECT * FROM fn(args)``) are rewritten by
    SessionContext.sql — the function runs once on the driver and its
    result registers as the scanned relation (same execution model as
    the reference's UDTF, which also materializes the provider at plan
    time)."""

    def __init__(self, fn, name: str | None = None, with_session: bool = False):
        if (
            getattr(fn, "__datafusion_table_function__", None) is not None
            and with_session
        ):
            raise TypeError(
                "with_session=True is not supported for FFI-exported table "
                "functions (__datafusion_table_function__ capsule exports)"
            )
        self.fn = fn
        self.name = _CallableName(name or getattr(fn, "__name__", "table_fn"))
        self.with_session = with_session

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def _register(self, spark) -> None:
        pass  # planning-time only — SessionContext.sql dispatches by name


def udtf(arg=None, name: str | None = None, return_type: str | None = None, with_session: bool = False):
    """Table-function factory, three forms (ref user_defined.py udtf):

    - ``udtf(fn, "name"[, with_session=True])`` — planning-time table fn
    - ``@udtf("name"[, with_session=True])`` — decorator form of the same
    - ``@udtf(return_type="a int, b string")`` — Spark-native Python UDTF
      (row-generating ``eval`` class, executor-side)
    """
    if isinstance(arg, str) and return_type is None:
        dname = arg

        def deco_ref(fn):
            return PyTableFunction(fn, dname, with_session)

        return deco_ref
    if return_type is not None:
        if arg is None:
            def deco_spark(c):
                return SparkTableFunction(c, return_type, name)

            return deco_spark
        return SparkTableFunction(arg, return_type, name)
    if callable(arg) or getattr(arg, "__datafusion_table_function__", None) is not None:
        return PyTableFunction(arg, name, with_session)
    raise TypeError(
        "udtf requires a callable + name, a name for decorator use, or "
        "return_type='col type, ...' for the Spark-native form"
    )


# -- reference class-method surface (ref user_defined.py: ScalarUDF.udf etc.) --
def _no_pycapsule(kind: str):
    def from_pycapsule(capsule, *a, **k):
        raise NotImplementedError(
            f"{kind}.from_pycapsule imports a DataFusion FFI capsule (Rust "
            "ABI); Spark has no equivalent — define the function in Python "
            "or register a JVM function via spark.udf.registerJavaFunction"
        )

    return staticmethod(from_pycapsule)


ScalarUDF.udf = staticmethod(udf)
ScalarUDF.from_pycapsule = _no_pycapsule("ScalarUDF")
AggregateUDF.udaf = staticmethod(udaf)
AggregateUDF.from_pycapsule = _no_pycapsule("AggregateUDF")
WindowUDF.udwf = staticmethod(udwf)
WindowUDF.from_pycapsule = _no_pycapsule("WindowUDF")
TableFunction.udtf = staticmethod(udtf)


def data_type_or_field_to_field(value, name: str):
    """pa.Field from a Field or DataType (ref user_defined.py:84)."""
    import pyarrow as pa

    if isinstance(value, pa.Field):
        return value
    return pa.field(name, type=value)


def data_types_or_fields_to_field_list(inputs) -> list:
    """list[pa.Field] from fields/types or a lone one (ref
    user_defined.py:91)."""
    import pyarrow as pa

    if isinstance(inputs, (pa.DataType, pa.Field)):
        inputs = [inputs]
    return [
        data_type_or_field_to_field(v, f"value{i}" if len(inputs) > 1 else "value")
        for i, v in enumerate(inputs)
    ]
