"""3-level catalog surface: catalog → schema(database) → table.

ref python/datafusion/catalog.py:51-374 (Catalog/Schema/Table classes,
in-memory providers catalog.rs:122-252). Spark's `spark.catalog` is the
same 3-level namespace (catalog.database.table); these wrappers expose
the reference's navigation methods over it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["Catalog", "Schema", "Table"]


class Table:
    """A named dataset (ref catalog.py:193)."""

    def __init__(self, spark: SparkSession, qualified_name: str) -> None:
        self._spark = spark
        self.name = qualified_name.split(".")[-1]
        self.qualified_name = qualified_name

    def schema(self):
        import pyarrow as pa

        df = self._spark.table(self.qualified_name)
        return pa.schema(df.limit(0).toArrow().schema)

    def to_df(self):
        from .dataframe import DataFrame

        return DataFrame(self._spark.table(self.qualified_name))

    @property
    def kind(self) -> str:
        for t in self._spark.catalog.listTables():
            if t.name == self.name:
                return "view" if t.tableType in ("TEMPORARY", "VIEW") else "table"
        return "table"

    def __repr__(self) -> str:
        return f"Table({self.qualified_name})"


class Schema:
    """A database within a catalog (ref catalog.py:123)."""

    def __init__(self, spark: SparkSession, name: str) -> None:
        self._spark = spark
        self.name = name

    def names(self) -> set[str]:
        return {t.name for t in self._spark.catalog.listTables(self.name)}

    def table_names(self) -> set[str]:
        return self.names()

    def table(self, name: str) -> Table:
        return Table(self._spark, name)

    def register_table(self, name: str, table_df) -> None:
        table_df.df.createOrReplaceTempView(name)

    def deregister_table(self, name: str) -> None:
        self._spark.catalog.dropTempView(name)

    def __repr__(self) -> str:
        return f"Schema({self.name})"


class Catalog:
    """Top-level catalog (ref catalog.py:51)."""

    def __init__(self, spark: SparkSession, name: str = "spark_catalog") -> None:
        self._spark = spark
        self.name = name

    def names(self) -> set[str]:
        return {d.name for d in self._spark.catalog.listDatabases()}

    def schema_names(self) -> set[str]:
        return self.names()

    def schema(self, name: str = "default") -> Schema:
        return Schema(self._spark, name)

    database = schema

    def __repr__(self) -> str:
        return f"Catalog({self.name})"
