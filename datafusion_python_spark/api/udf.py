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

__all__ = ["udf", "udaf", "ScalarUDF", "Accumulator", "AggregateUDF"]


class ScalarUDF:
    def __init__(self, fn: Callable, input_types, return_type, volatility: str = "immutable", name: str | None = None):
        self.fn = fn
        self.input_types = input_types
        self.return_type = return_type
        self.volatility = volatility
        self.name = name or fn.__name__

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
        self.name = name or getattr(accum, "__name__", "udaf")
        self._spark_ret = _spark_type(ScalarUDF._type_name(return_type))

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

    def __call__(self, *args) -> Expr:
        raise NotImplementedError(
            "column-position UDAFs need DataFrame.aggregate integration; "
            "use AggregateUDF.apply_grouped(df, group_cols, value_cols, out)"
        )

    def _register(self, spark) -> None:
        pass  # name-based SQL registration unsupported for the emulation


def udaf(accum, input_types=None, return_type=None, state_type=None, volatility: str = "immutable", name: str | None = None):
    """ref user_defined.py:358-706."""
    return AggregateUDF(accum, input_types, return_type, state_type, volatility, name)
