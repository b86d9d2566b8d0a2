"""datafusion_python_spark — a PySpark-native analytics engine with the
query surface of apache/datafusion-python.

The reference (read-only at /root/reference) defines *what* to compute:
a SessionContext/DataFrame/Expr API over a batch columnar engine. Here
the execution engine is Apache Spark — logical plans are declared with
the PySpark DataFrame/SQL API and optimized by Catalyst/Tungsten/AQE.

Top-level surface mirrors the reference's ``datafusion`` package
(`python/datafusion/__init__.py` __all__): a user can switch their
imports from ``datafusion`` to ``datafusion_python_spark`` and keep
``SessionContext``, ``col``/``lit``, ``functions``, ``udf``/``udaf``/
``udwf``/``udtf``, writer options, catalog and object-store types, and
the ``read_*`` convenience functions.
"""

from . import common
from .api import catalog, substrait
from .api import dataframe_formatter, ipc, options
from .api.dataframe_formatter import DataFrameHtmlFormatter
from .api import expr as expr
from .api import functions as functions
from .api import spark_functions
from .api.catalog import (
    Catalog,
    CatalogProvider,
    InMemoryCatalogProvider,
    InMemorySchemaProvider,
    Schema,
    SchemaProvider,
    Table,
    TableProviderFactory,
    TableProviderFactoryExportable,
)
from .api.config import (
    CsvReadOptions,
    ExplainFormat,
    InsertOp,
    RuntimeEnvBuilder,
    SessionConfig,
)
from .api.context import SessionContext, SQLOptions
from .api.dataframe import (
    DataFrame,
    DataFrameWriteOptions,
    ParquetColumnOptions,
    ParquetWriterOptions,
)
from .api.expr import Expr, SortExpr, Window, WindowFrame, col, lit
from .api.plan import ExecutionPlan, LogicalPlan, Metric, MetricsSet
from .api.record_batch import RecordBatch, RecordBatchStream
from .api.substrait import Unparser as unparser  # module-shaped alias
from .api.udf import (
    Accumulator,
    AggregateUDF,
    ScalarUDF,
    TableFunction,
    WindowEvaluator,
    WindowUDF,
    udaf,
    udf,
    udtf,
    udwf,
)
from .common import DFSchema, NullTreatment
from .session import get_spark
from .sources import object_store

column = col
literal = lit

_DEFAULT_CTX: SessionContext | None = None


def _default_ctx() -> SessionContext:
    global _DEFAULT_CTX
    if _DEFAULT_CTX is None:
        _DEFAULT_CTX = SessionContext()
    return _DEFAULT_CTX


def read_parquet(path, *args, **kwargs) -> DataFrame:
    """Module-level convenience (ref io.py:37): read with a default ctx."""
    return _default_ctx().read_parquet(path, *args, **kwargs)


def read_csv(path, *args, options: CsvReadOptions | None = None, **kwargs) -> DataFrame:
    """ref io.py:122; accepts CsvReadOptions or the reference kwargs."""
    return _default_ctx().read_csv(path, *args, options=options, **kwargs)


def read_json(path, *args, **kwargs) -> DataFrame:
    """ref io.py:83."""
    return _default_ctx().read_json(path, *args, **kwargs)


def string_literal(value: str) -> Expr:
    """String literal expression (ref __init__.py string_literal)."""
    return Expr.string_literal(value)


str_lit = string_literal


def literal_with_metadata(value, metadata: dict) -> Expr:
    """Literal carrying field metadata (ref literal_with_metadata)."""
    return Expr.literal_with_metadata(value, metadata)


lit_with_metadata = literal_with_metadata


def read_avro(path, *args, **kwargs) -> DataFrame:
    """ref io.py:172."""
    return _default_ctx().read_avro(path, *args, **kwargs)


def configure_formatter(**kwargs) -> None:
    """Configure DataFrame display (ref dataframe_formatter
    configure_formatter): installs a freshly-built formatter and mirrors
    max_rows into Spark's repl eager-eval setting."""
    dataframe_formatter.configure_formatter(**kwargs)
    if "max_rows" in kwargs or "repr_rows" in kwargs:
        try:
            n = kwargs.get("max_rows", kwargs.get("repr_rows"))
            _default_ctx().spark.conf.set("spark.sql.repl.eagerEval.maxNumRows", str(n))
        except Exception:
            pass


__all__ = [
    "Accumulator",
    "AggregateUDF",
    "Catalog",
    "CatalogProvider",
    "CsvReadOptions",
    "DFSchema",
    "DataFrame",
    "DataFrameWriteOptions",
    "ExecutionPlan",
    "ExplainFormat",
    "Expr",
    "InMemoryCatalogProvider",
    "InMemorySchemaProvider",
    "InsertOp",
    "LogicalPlan",
    "Metric",
    "MetricsSet",
    "NullTreatment",
    "ParquetColumnOptions",
    "ParquetWriterOptions",
    "RecordBatch",
    "RecordBatchStream",
    "RuntimeEnvBuilder",
    "SQLOptions",
    "ScalarUDF",
    "Schema",
    "SchemaProvider",
    "SessionConfig",
    "SessionContext",
    "SortExpr",
    "Table",
    "TableFunction",
    "TableProviderFactory",
    "TableProviderFactoryExportable",
    "Window",
    "WindowEvaluator",
    "WindowFrame",
    "WindowUDF",
    "catalog",
    "col",
    "column",
    "common",
    "configure_formatter",
    "expr",
    "functions",
    "get_spark",
    "ipc",
    "lit",
    "lit_with_metadata",
    "literal",
    "literal_with_metadata",
    "object_store",
    "options",
    "str_lit",
    "string_literal",
    "read_avro",
    "read_csv",
    "read_json",
    "read_parquet",
    "spark_functions",
    "substrait",
    "udaf",
    "udf",
    "udtf",
    "udwf",
    "unparser",
]
__version__ = "0.2.0"
