"""Common types (ref python/datafusion/common.py:20-110).

The reference re-exports Rust metadata types used by its SQL frontend
(``crates/core/src/common/{schema,data_type,function}.rs``). Here they
are plain-Python classes with the same constructors, fields, and
mappings: ``SqlTable``/``SqlView``/``SqlSchema``/``SqlStatistics``
describe registered relations (used by the :mod:`.input` plugins),
``DataTypeMap`` maps an Arrow type to its Python and ANSI-SQL
equivalents exactly as ``data_type.rs map_from_arrow_type`` does, and
``NullTreatment``/``RexType``/``DFSchema`` back the Expr/aggregate
surface.
"""

from __future__ import annotations

from enum import Enum
from typing import Any


class RexType(Enum):
    """Coarse expression kind (ref common.py RexType — row-expression
    taxonomy used by Expr.rex_type): a literal value, a column
    reference, an alias, a function/operator call, a scalar subquery,
    or other."""

    Alias = "alias"
    Literal = "literal"
    Call = "call"
    Reference = "reference"
    ScalarSubquery = "scalar_subquery"
    Other = "other"


class NullTreatment(Enum):
    """How aggregate/window functions treat nulls (ref common.py:59)."""

    RESPECT_NULLS = "respect nulls"
    IGNORE_NULLS = "ignore nulls"


class PythonType(Enum):
    """Python-side type taxonomy (ref data_type.rs:679)."""

    Array = "array"
    Bool = "bool"
    Bytes = "bytes"
    Datetime = "datetime"
    Float = "float"
    Int = "int"
    List = "list"
    none = "none"  # ``None`` is not a valid identifier; alias below
    Object = "object"
    Str = "str"


# the reference spells it PythonType.None; make that attribute access work
setattr(PythonType, "None", PythonType.none)


class SqlType(Enum):
    """ANSI-SQL type taxonomy (ref data_type.rs:706)."""

    ANY = "any"
    ARRAY = "array"
    BIGINT = "bigint"
    BINARY = "binary"
    BOOLEAN = "boolean"
    CHAR = "char"
    COLUMN_LIST = "column_list"
    CURSOR = "cursor"
    DATE = "date"
    DECIMAL = "decimal"
    DISTINCT = "distinct"
    DOUBLE = "double"
    DYNAMIC_STAR = "dynamic_star"
    FLOAT = "float"
    GEOMETRY = "geometry"
    INTEGER = "integer"
    INTERVAL = "interval"
    INTERVAL_DAY = "interval_day"
    INTERVAL_DAY_HOUR = "interval_day_hour"
    INTERVAL_DAY_MINUTE = "interval_day_minute"
    INTERVAL_DAY_SECOND = "interval_day_second"
    INTERVAL_HOUR = "interval_hour"
    INTERVAL_HOUR_MINUTE = "interval_hour_minute"
    INTERVAL_HOUR_SECOND = "interval_hour_second"
    INTERVAL_MINUTE = "interval_minute"
    INTERVAL_MINUTE_SECOND = "interval_minute_second"
    INTERVAL_MONTH = "interval_month"
    INTERVAL_SECOND = "interval_second"
    INTERVAL_YEAR = "interval_year"
    INTERVAL_YEAR_MONTH = "interval_year_month"
    MAP = "map"
    MULTISET = "multiset"
    NULL = "null"
    OTHER = "other"
    REAL = "real"
    ROW = "row"
    SARG = "sarg"
    SMALLINT = "smallint"
    STRUCTURED = "structured"
    SYMBOL = "symbol"
    TIME = "time"
    TIME_WITH_LOCAL_TIME_ZONE = "time_with_local_time_zone"
    TIMESTAMP = "timestamp"
    TIMESTAMP_WITH_LOCAL_TIME_ZONE = "timestamp_with_local_time_zone"
    TINYINT = "tinyint"
    UNKNOWN = "unknown"
    VARBINARY = "varbinary"
    VARCHAR = "varchar"


class TableType(Enum):
    """Kind of registered relation (ref logical_expr TableType)."""

    Base = "base"
    View = "view"
    Temporary = "temporary"


class DataType:
    """Arrow data-type wrapper (ref common.DataType = PyDataType,
    data_type.rs). Holds a :class:`pyarrow.DataType`."""

    def __init__(self, data_type: Any) -> None:
        self.data_type = data_type

    def __eq__(self, other: object) -> bool:
        return isinstance(other, DataType) and self.data_type == other.data_type

    def __hash__(self) -> int:
        return hash(str(self.data_type))

    def __repr__(self) -> str:
        return f"DataType({self.data_type})"


def _arrow_to_py_sql(t) -> tuple[PythonType, SqlType]:
    """Arrow type → (PythonType, SqlType), per data_type.rs
    map_from_arrow_type."""
    import pyarrow as pa

    if pa.types.is_null(t):
        return PythonType.none, SqlType.NULL
    if pa.types.is_boolean(t):
        return PythonType.Bool, SqlType.BOOLEAN
    if pa.types.is_int8(t) or pa.types.is_uint8(t):
        return PythonType.Int, SqlType.TINYINT
    if pa.types.is_int16(t) or pa.types.is_uint16(t):
        return PythonType.Int, SqlType.SMALLINT
    if pa.types.is_int32(t) or pa.types.is_uint32(t):
        return PythonType.Int, SqlType.INTEGER
    if pa.types.is_int64(t) or pa.types.is_uint64(t):
        return PythonType.Int, SqlType.BIGINT
    if pa.types.is_float16(t) or pa.types.is_float32(t):
        return PythonType.Float, SqlType.FLOAT
    if pa.types.is_float64(t):
        return PythonType.Float, SqlType.DOUBLE
    if pa.types.is_decimal(t):
        return PythonType.Float, SqlType.DECIMAL
    if pa.types.is_date32(t) or pa.types.is_date64(t):
        return PythonType.Datetime, SqlType.DATE
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return PythonType.Datetime, SqlType.TIME
    if pa.types.is_timestamp(t):
        if getattr(t, "tz", None):
            return PythonType.Datetime, SqlType.TIMESTAMP_WITH_LOCAL_TIME_ZONE
        return PythonType.Datetime, SqlType.TIMESTAMP
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return PythonType.Str, SqlType.VARCHAR
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return PythonType.Bytes, SqlType.BINARY
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return PythonType.List, SqlType.ARRAY
    if pa.types.is_map(t):
        return PythonType.Object, SqlType.MAP
    if pa.types.is_struct(t):
        return PythonType.Object, SqlType.ROW
    if pa.types.is_interval(t) or pa.types.is_duration(t):
        return PythonType.Object, SqlType.INTERVAL
    return PythonType.Object, SqlType.OTHER


class DataTypeMap:
    """Arrow / Python / SQL type triple (ref data_type.rs DataTypeMap)."""

    def __init__(self, arrow_type: DataType, python_type: PythonType, sql_type: SqlType) -> None:
        self.arrow_type = arrow_type
        self.python_type = python_type
        self.sql_type = sql_type

    @staticmethod
    def arrow(arrow_type: Any) -> "DataTypeMap":
        """From an Arrow type (ref py_map_from_arrow_type)."""
        t = arrow_type.data_type if isinstance(arrow_type, DataType) else arrow_type
        py, sql = _arrow_to_py_sql(t)
        return DataTypeMap(DataType(t), py, sql)

    @staticmethod
    def arrow_str(arrow_type_str: str) -> "DataTypeMap":
        """From an Arrow type name like ``'int64'`` (ref
        py_map_from_arrow_type_str)."""
        import pyarrow as pa

        aliases = {
            "utf8": pa.string(),
            "large_utf8": pa.large_string(),
            "str": pa.string(),
            "datetime64[ns]": pa.timestamp("ns"),
        }
        t = aliases.get(arrow_type_str.lower())
        if t is None:
            try:
                t = getattr(pa, arrow_type_str.lower())()
            except (AttributeError, TypeError):
                raise ValueError(
                    f"Unable to determine Arrow Data Type from string: {arrow_type_str!r}"
                ) from None
        return DataTypeMap.arrow(t)

    @staticmethod
    def from_parquet_type_str(parquet_str_type: str) -> "DataTypeMap":
        """From a parquet physical-type string (ref
        py_map_from_parquet_type_str; INT96 → ns timestamp)."""
        import pyarrow as pa

        mapping = {
            "boolean": pa.bool_(),
            "int32": pa.int32(),
            "int64": pa.int64(),
            "int96": pa.timestamp("ns"),
            "float": pa.float32(),
            "double": pa.float64(),
            "byte_array": pa.string(),
        }
        t = mapping.get(parquet_str_type.lower())
        if t is None:
            raise ValueError(
                "Unable to determine Arrow Data Type from Parquet String type: "
                f"{parquet_str_type!r}"
            )
        return DataTypeMap.arrow(t)

    @staticmethod
    def sql(sql_type: SqlType) -> "DataTypeMap":
        """From an ANSI-SQL type (ref py_map_from_sql_type)."""
        import pyarrow as pa

        mapping = {
            SqlType.NULL: pa.null(),
            SqlType.BOOLEAN: pa.bool_(),
            SqlType.TINYINT: pa.int8(),
            SqlType.SMALLINT: pa.int16(),
            SqlType.INTEGER: pa.int32(),
            SqlType.BIGINT: pa.int64(),
            SqlType.FLOAT: pa.float32(),
            SqlType.REAL: pa.float32(),
            SqlType.DOUBLE: pa.float64(),
            SqlType.DATE: pa.date64(),
            SqlType.TIME: pa.time64("ns"),
            SqlType.TIMESTAMP: pa.timestamp("ns"),
            SqlType.VARCHAR: pa.string(),
            SqlType.CHAR: pa.string(),
            SqlType.BINARY: pa.binary(),
            SqlType.VARBINARY: pa.binary(),
        }
        t = mapping.get(sql_type)
        if t is None:
            raise NotImplementedError(f"{sql_type}")
        return DataTypeMap.arrow(t)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, DataTypeMap)
            and self.arrow_type == other.arrow_type
            and self.python_type is other.python_type
            and self.sql_type is other.sql_type
        )

    def __repr__(self) -> str:
        return (
            f"DataTypeMap({self.arrow_type!r}, {self.python_type}, {self.sql_type})"
        )


class SqlStatistics:
    """Table statistics: row count (ref schema.rs:269)."""

    def __init__(self, row_count: float) -> None:
        self._row_count = float(row_count)

    def getRowCount(self) -> float:  # noqa: N802 - reference camelCase name
        return self._row_count


class SqlTable:
    """Registered-table metadata (ref schema.rs:58 — name, typed
    columns, keys/indexes/constraints, statistics, file paths)."""

    def __init__(
        self,
        table_name: str,
        columns: list[tuple[str, DataTypeMap]],
        row_count: float,
        filepaths: list[str] | None = None,
    ) -> None:
        self.name = table_name
        self.columns = columns
        self.primary_key: str | None = None
        self.foreign_keys: list[str] = []
        self.indexes: list[str] = []
        self.constraints: list[str] = []
        self.statistics = SqlStatistics(row_count)
        self.filepaths = filepaths


class SqlView:
    """Registered-view metadata: name + defining SQL (ref schema.rs:107)."""

    def __init__(self, name: str, definition: str) -> None:
        self.name = name
        self.definition = definition


class SqlSchema:
    """A named collection of tables/views/functions (ref schema.rs:44)."""

    def __init__(self, schema_name: str) -> None:
        self.name = schema_name
        self.tables: list[SqlTable] = []
        self.views: list[SqlView] = []
        self.functions: list[SqlFunction] = []

    def table_by_name(self, table_name: str) -> SqlTable | None:
        for tbl in self.tables:
            if tbl.name == table_name:
                return tbl
        return None

    def add_table(self, table: SqlTable) -> None:
        self.tables.append(table)

    def drop_table(self, table_name: str) -> None:
        self.tables = [t for t in self.tables if t.name != table_name]


class SqlFunction:
    """Function signature metadata (ref function.rs:33 — name, input→
    return type mappings, aggregate flag)."""

    def __init__(
        self,
        function_name: str,
        input_types: list[Any],
        return_type: Any,
        aggregation_bool: bool,
    ) -> None:
        self.name = function_name
        self.return_types: dict[tuple, Any] = {}
        self.aggregation = aggregation_bool
        self.add_type_mapping(input_types, return_type)

    def add_type_mapping(self, input_types: list[Any], return_type: Any) -> None:
        self.return_types[tuple(str(t) for t in input_types)] = return_type


class TableSource:
    """Schema + optional statistics of a relation as seen by the
    planner (ref schema.rs SqlTableSource)."""

    def __init__(self, schema, statistics: SqlStatistics | None = None, filepaths=None) -> None:
        self._schema = schema
        self._statistics = statistics
        self._filepaths = filepaths

    def schema(self):
        return self._schema

    def table_type(self) -> TableType:
        return TableType.Base

    def statistics(self) -> SqlStatistics | None:
        return self._statistics

    def filepaths(self):
        return self._filepaths


class Constraints:
    """Relation constraints (ref expr Constraints — opaque holder)."""

    def __init__(self, constraints: list[str] | None = None) -> None:
        self._constraints = list(constraints or [])

    def __repr__(self) -> str:
        return f"Constraints({self._constraints})"


class DFSchema:
    """Schema wrapper (ref common.py DFSchema) over a pyarrow schema."""

    def __init__(self, schema) -> None:
        self._schema = schema

    @classmethod
    def from_dataframe(cls, df) -> "DFSchema":
        sdf = getattr(df, "df", df)
        return cls(sdf.limit(0).toArrow().schema)

    @classmethod
    def empty(cls) -> "DFSchema":
        """Field-less schema (ref DFSchema::empty)."""
        import pyarrow as pa

        return cls(pa.schema([]))

    def field_names(self) -> list[str]:
        return list(self._schema.names)

    def to_pyarrow(self):
        return self._schema

    def __repr__(self) -> str:
        return f"DFSchema({self.field_names()})"


__all__ = [
    "Constraints",
    "DFSchema",
    "DataType",
    "DataTypeMap",
    "NullTreatment",
    "PythonType",
    "RexType",
    "SqlFunction",
    "SqlSchema",
    "SqlStatistics",
    "SqlTable",
    "SqlType",
    "SqlView",
    "TableSource",
    "TableType",
]
