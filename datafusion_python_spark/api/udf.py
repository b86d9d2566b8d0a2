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

from .expr import Expr, _c, _spark_type

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
        self.name = _CallableName(name or fn.__name__)

        spark_ret = _spark_type(self._type_name(return_type))

        def pandas_wrapper(*series: pd.Series) -> pd.Series:
            import pyarrow as pa

            arrays = [pa.Array.from_pandas(s) for s in series]
            out = fn(*arrays)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            return out.to_pandas()

        self._pudf = F.pandas_udf(pandas_wrapper, returnType=spark_ret)
        if volatility == "volatile":
            self._pudf = self._pudf.asNondeterministic()

    @staticmethod
    def _type_name(t) -> str:
        try:
            import pyarrow as pa

            if isinstance(t, pa.DataType):
                return str(t)
        except ImportError:
            pass
        return t if isinstance(t, str) else str(t)

    def __call__(self, *args) -> Expr:
        return Expr(self._pudf(*[_c(a) for a in args]))

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


class Accumulator:
    """Subclass contract (ref user_defined.py:358): state / update /
    merge / evaluate over pyarrow values."""

    def state(self) -> list:
        raise NotImplementedError

    def update(self, *values) -> None:
        raise NotImplementedError

    def merge(self, states: list) -> None:
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError


class AggregateUDF:
    def __init__(self, accum: Callable[[], Accumulator], input_types, return_type, state_type=None, volatility: str = "immutable", name: str | None = None):
        self.accum = accum
        self.input_types = input_types
        self.return_type = return_type
        self.name = _CallableName(name or getattr(accum, "__name__", "udaf"))
        self._spark_ret = _spark_type(ScalarUDF._type_name(return_type))
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


def udaf(accum, input_types=None, return_type=None, state_type=None, volatility: str = "immutable", name: str | None = None):
    """ref user_defined.py:358-706."""
    return AggregateUDF(accum, input_types, return_type, state_type, volatility, name)


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
        self._spark_ret = _spark_type(ScalarUDF._type_name(return_type))

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

        return DF(df.df.groupBy(*partition_by).applyInPandas(run, schema=schema))


def udwf(evaluator, input_types=None, return_type=None, volatility: str = "immutable", name: str | None = None):
    """ref user_defined.py:709 — returns a WindowUDF whose ``apply`` emulates
    ``expr.over(window)`` for unbounded frames."""
    return WindowUDF(evaluator, input_types, return_type, volatility, name)


class TableFunction:
    """UDTF (ref user_defined.py TableFunction / udtf.rs): a class with an
    ``eval`` yielding rows, registered for SQL ``SELECT * FROM fn(...)``
    via Spark 3.5+ Python UDTFs."""

    def __init__(self, cls, return_type: str, name: str | None = None):
        from pyspark.sql.functions import udtf as spark_udtf

        self.name = _CallableName(name or cls.__name__)
        self._udtf = spark_udtf(cls, returnType=return_type)

    def __call__(self, *args):
        return self._udtf(*[_c(a) for a in args])

    def _register(self, spark) -> None:
        spark.udtf.register(self.name, self._udtf)


def udtf(cls=None, return_type: str | None = None, name: str | None = None):
    """Decorator/factory: ``@udtf(return_type="a int, b string")``."""
    if cls is not None and return_type is None:
        raise TypeError("udtf requires return_type='col type, ...'")
    if cls is not None:
        return TableFunction(cls, return_type, name)

    def deco(c):
        return TableFunction(c, return_type, name)

    return deco


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
