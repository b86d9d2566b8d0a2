"""Public API façade mirroring apache/datafusion-python's surface.

Reference shape (python/datafusion/__init__.py): SessionContext,
DataFrame, Expr, col/column, lit/literal, functions module, udf/udaf.
Implementation is pure PySpark — SessionContext wraps SparkSession,
DataFrame wraps pyspark.sql.DataFrame, Expr wraps Column, and the
functions registry dispatches to pyspark.sql.functions (with
compositions where Spark lacks a 1:1 builtin).
"""

from .context import SQLOptions, SessionContext
from .dataframe import DataFrame
from .expr import CaseBuilder, Expr, Window, WindowFrame, col, column, lit, literal
from .udf import (
    Accumulator,
    ScalarUDF,
    TableFunction,
    WindowEvaluator,
    WindowUDF,
    udaf,
    udf,
    udtf,
    udwf,
)

from . import functions

__all__ = [
    "SessionContext",
    "SQLOptions",
    "DataFrame",
    "Expr",
    "CaseBuilder",
    "Window",
    "WindowFrame",
    "col",
    "column",
    "lit",
    "literal",
    "functions",
    "udf",
    "udaf",
    "udwf",
    "udtf",
    "ScalarUDF",
    "Accumulator",
    "WindowEvaluator",
    "WindowUDF",
    "TableFunction",
]
