"""3-level catalog surface: catalog → schema(database) → table.

ref python/datafusion/catalog.py:51-374 (Catalog/Schema/Table classes,
in-memory providers catalog.rs:122-252). Spark's `spark.catalog` is the
same 3-level namespace (catalog.database.table); these wrappers expose
the reference's navigation methods over it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "Catalog",
    "Schema",
    "Table",
    "TableProviderFactory",
    "TableProviderFactoryExportable",
]


class Table:
    """A named dataset (ref catalog.py:193). Two construction forms:
    ``Table(spark, "qualified.name")`` (catalog navigation) and the
    reference's ``Table(dataset)`` (wrap a pyarrow dataset / provider —
    used by table functions, ref catalog.py Table.__init__)."""

    def __init__(self, spark=None, qualified_name: str | None = None) -> None:
        if qualified_name is None and not isinstance(spark, (SparkSession, type(None))):
            # Table(dataset) form
            self._dataset = spark
            self._spark = None
            self.name = f"__table_{id(spark)}"
            self.qualified_name = self.name
            return
        self._dataset = None
        self._spark = spark
        self.name = (qualified_name or "").split(".")[-1]
        self.qualified_name = qualified_name or ""

    @property
    def schema(self):
        """pyarrow schema (ref catalog.py Table.schema — a property)."""
        import pyarrow as pa

        if self._dataset is not None:
            s = getattr(self._dataset, "schema", None)
            if callable(s):  # package DataFrame.schema() is a method
                return s()
            if s is not None:
                return s
            sdf = getattr(self._dataset, "df", self._dataset)
            return pa.schema(sdf.limit(0).toArrow().schema)
        df = self._spark.table(self.qualified_name)
        return pa.schema(df.limit(0).toArrow().schema)

    def to_df(self):
        from .dataframe import DataFrame

        return DataFrame(self._spark.table(self.qualified_name))

    @property
    def kind(self) -> str:
        """"physical" for data-backed tables, "view"/"temporary" for view
        handles (ref catalog.py Table.kind / DataFusion TableType)."""
        vk = getattr(self, "_view_kind", None)
        if vk:
            return vk
        ctx = getattr(self, "_ctx", None)
        if ctx is not None and self.name in getattr(ctx, "_view_names", set()):
            return "view"
        return "physical"

    @staticmethod
    def from_dataset(dataset) -> "Table":
        """Table over a pyarrow dataset (ref catalog.py Table.from_dataset):
        file-backed parquet datasets register through Spark's native
        reader (pushdown-capable), others via Arrow materialization."""
        from ..session import get_spark
        from .context import SessionContext

        ctx = SessionContext.global_ctx()
        name = f"__dataset_{id(dataset)}"
        ctx.register_dataset(name, dataset)
        return Table(get_spark(), name)

    def __repr__(self) -> str:
        return f"Table({self.qualified_name})"


def _to_spark_df(spark, table, ctx=None):
    """Coerce any supported table-ish object to a pyspark DataFrame."""
    import pyarrow as pa

    obj = table
    inner = getattr(obj, "_dataset", None)
    if inner is not None:
        obj = inner
    if isinstance(obj, Table) and obj._spark is not None:
        # catalog-navigated Table: resolve through the session catalog
        return obj._spark.table(obj.qualified_name)
    if hasattr(obj, "df"):  # package DataFrame
        return obj.df
    if hasattr(obj, "createOrReplaceTempView"):  # pyspark DataFrame
        return obj
    if isinstance(obj, pa.RecordBatch):
        obj = pa.Table.from_batches([obj])
    if hasattr(obj, "to_table") and not isinstance(obj, pa.Table):
        obj = obj.to_table()
    if isinstance(obj, pa.Table):
        try:
            return spark.createDataFrame(obj)
        except Exception:
            return spark.createDataFrame(obj.to_pandas())
    raise TypeError(f"unsupported table object: {type(table).__name__}")


class Schema:
    """A database within a catalog (ref catalog.py:123)."""

    def __init__(self, spark: SparkSession, name: str, ctx=None) -> None:
        self._spark = spark
        self.name = name
        self._ctx = ctx

    def names(self) -> set[str]:
        # When navigated from a SessionContext, list only that context's
        # registrations — DataFusion contexts are isolated; Spark temp
        # views are session-global (see SessionContext._registered_names).
        reg = getattr(self._ctx, "_registered_names", None)
        if reg is not None:
            return set(reg)
        return {t.name for t in self._spark.catalog.listTables(self.name)}

    def table_names(self) -> set[str]:
        return self.names()

    def table(self, name: str) -> Table:
        t = Table(self._spark, name)
        t._ctx = self._ctx
        return t

    def register_table(self, name: str, table_df) -> None:
        """Register a DataFrame, pyspark DataFrame, pyarrow dataset /
        table / batch, or Table(dataset) under this schema."""
        sdf = _to_spark_df(self._spark, table_df, self._ctx)
        sdf.createOrReplaceTempView(name)
        if self._ctx is not None:
            self._ctx._note_table(name)

    def deregister_table(self, name: str) -> None:
        self._spark.catalog.dropTempView(name)
        reg = getattr(self._ctx, "_registered_names", None)
        if reg is not None:
            reg.discard(name)

    def table_exist(self, name: str) -> bool:
        return name in self.names()

    @staticmethod
    def memory_schema() -> "InMemorySchemaProvider":
        """A fresh in-memory schema (ref catalog.py Schema.memory_schema)."""
        return InMemorySchemaProvider()

    def __repr__(self) -> str:
        return f"Schema({self.name})"


class SchemaProvider:
    """Python schema provider contract (ref catalog.py:332-374): subclass
    and implement table_names/table/table_exist; register_table and
    deregister_table are optional. Tables returned may be this package's
    DataFrame, a pyspark DataFrame, or a pyarrow Table."""

    def owner_name(self) -> str | None:
        return None

    def table_names(self) -> set[str]:
        raise NotImplementedError

    def table(self, name: str):
        raise NotImplementedError

    def table_exist(self, name: str) -> bool:
        return name in self.table_names()

    def register_table(self, name: str, table) -> None:  # optional
        raise NotImplementedError("this schema provider is read-only")

    def deregister_table(self, name: str, cascade: bool = False) -> None:  # optional
        raise NotImplementedError("this schema provider is read-only")


class CatalogProviderList:
    """Python catalog-provider-list contract (ref catalog.py:255-275):
    subclass and implement catalog_names/catalog; register_catalog is
    optional. Consumed by
    ``SessionContext.register_catalog_provider_list``."""

    def catalog_names(self) -> set[str]:
        raise NotImplementedError

    def catalog(self, name: str):
        raise NotImplementedError

    def register_catalog(self, name: str, catalog) -> None:  # optional
        raise NotImplementedError("this catalog list is read-only")


class TableProviderFactory:
    """Factory contract for CREATE EXTERNAL TABLE handling (ref
    catalog.py:237-243): subclass and implement ``create(cmd)`` returning
    a table (this package's DataFrame, a pyspark DataFrame, or a pyarrow
    Table). ``cmd`` carries the statement's name/location/options. In the
    Spark mapping, factories are invoked by
    ``SessionContext.register_table_provider_factory`` consumers; native
    ``CREATE TABLE ... USING ... LOCATION`` handles the built-in formats.
    """

    def create(self, cmd):
        raise NotImplementedError


class TableProviderFactoryExportable:
    """Typing protocol for objects exposing a table-provider-factory
    capsule (ref catalog.py:246-252). The FFI capsule itself is a Rust
    ABI detail with no Spark analogue — objects implementing
    ``__datafusion_table_provider_factory__`` are accepted wherever a
    :class:`TableProviderFactory` is, for signature compatibility."""

    def __datafusion_table_provider_factory__(self, session=None) -> object:
        raise NotImplementedError


class CatalogProvider:
    """Python catalog provider contract (ref catalog.py:289-320)."""

    def schema_names(self) -> set[str]:
        raise NotImplementedError

    def schema(self, name: str) -> SchemaProvider | None:
        raise NotImplementedError

    def register_schema(self, name: str, schema) -> None:  # optional
        raise NotImplementedError("this catalog provider is read-only")

    def deregister_schema(self, name: str, cascade: bool = False) -> None:  # optional
        raise NotImplementedError("this catalog provider is read-only")


class InMemorySchemaProvider(SchemaProvider):
    """Dict-backed schema provider (ref in-memory providers catalog.rs:122)."""

    def __init__(self, tables: dict | None = None) -> None:
        self._tables = dict(tables or {})

    def table_names(self) -> set[str]:
        return set(self._tables)

    def table(self, name: str):
        return self._tables.get(name)

    def table_exist(self, name: str) -> bool:
        return name in self._tables

    def register_table(self, name: str, table) -> None:
        self._tables[name] = table

    def deregister_table(self, name: str, cascade: bool = False) -> None:
        self._tables.pop(name, None)


class InMemoryCatalogProvider(CatalogProvider):
    """Dict-backed catalog provider."""

    def __init__(self, schemas: dict | None = None) -> None:
        self._schemas = dict(schemas or {})

    def schema_names(self) -> set[str]:
        return set(self._schemas)

    def schema(self, name: str):
        return self._schemas.get(name)

    def register_schema(self, name: str, schema) -> None:
        self._schemas[name] = schema

    def deregister_schema(self, name: str, cascade: bool = False) -> None:
        self._schemas.pop(name, None)


class ProviderCatalog:
    """Navigation adapter presenting a registered Python CatalogProvider
    through the same surface as :class:`Catalog`. SQL access to provider
    tables goes through ``SessionContext.materialize_provider_tables``
    (Spark temp views are single-part names — documented deviation from
    the reference's three-part SQL resolution)."""

    def __init__(self, spark: SparkSession, name: str, provider: CatalogProvider) -> None:
        self._spark = spark
        self.name = name
        self.provider = provider

    def names(self) -> set[str]:
        return set(self.provider.schema_names())

    schema_names = names

    def schema(self, name: str = "default"):
        return self.provider.schema(name)

    database = schema

    def register_schema(self, name: str, schema) -> None:
        self.provider.register_schema(name, schema)

    def deregister_schema(self, name: str, cascade: bool = False) -> None:
        self.provider.deregister_schema(name, cascade)

    def __repr__(self) -> str:
        return f"ProviderCatalog({self.name})"


class ProviderSchema:
    """Schema adapter over a Python SchemaProvider registered on the
    DEFAULT catalog (ref catalog.py Schema over provider) — delegates
    storage to the provider so custom implementations keep control."""

    def __init__(self, provider, name: str, ctx=None) -> None:
        self.provider = provider
        self.name = name
        self._ctx = ctx

    def names(self) -> set[str]:
        return set(self.provider.table_names())

    def table_names(self) -> set[str]:
        return self.names()

    def table(self, name: str):
        return self.provider.table(name)

    def table_exist(self, name: str) -> bool:
        return self.provider.table_exist(name)

    def register_table(self, name: str, table) -> None:
        self.provider.register_table(name, table)

    def deregister_table(self, name: str, cascade: bool = False) -> None:
        self.provider.deregister_table(name)

    def __repr__(self) -> str:
        return f"ProviderSchema({self.name})"


class Catalog:
    """Top-level catalog (ref catalog.py:51)."""

    def __init__(self, spark: SparkSession, name: str = "spark_catalog", ctx=None) -> None:
        self._spark = spark
        self.name = name
        self._ctx = ctx

    def names(self) -> set[str]:
        """Schema names (ref Catalog.names): the default ``public``
        schema (DataFusion's name for the session database) plus any
        registered schema providers; ``deregister_schema("public")``
        hides the default."""
        ctx = self._ctx
        out = set(getattr(ctx, "_schema_providers", {})) if ctx is not None else set()
        if ctx is None or not getattr(ctx, "_public_deregistered", False):
            out.add("public")
        return out

    def schema_names(self) -> set[str]:
        return self.names()

    def schema(self, name: str = "public") -> Schema:
        providers = getattr(self._ctx, "_schema_providers", {}) if self._ctx else {}
        if name in providers:
            return ProviderSchema(providers[name], name, ctx=self._ctx)
        # "public" is DataFusion's default database; Spark's is "default"
        return Schema(self._spark, "default" if name in ("public",) else name, ctx=self._ctx)

    database = schema

    def register_schema(self, name: str, schema) -> None:
        """Attach a schema provider as a database (ref catalog.py
        Catalog.register_schema). The provider is tracked on the context
        (3-part SQL resolves through it); any current tables also
        materialize as ``<name>__<table>`` temp views for direct
        single-part SQL access."""
        if self._ctx is not None:
            if not hasattr(self._ctx, "_schema_providers"):
                self._ctx._schema_providers = {}
            self._ctx._schema_providers[name] = schema
        for tname in schema.table_names():
            tbl = schema.table(tname)
            try:
                sdf = _to_spark_df(self._spark, tbl, self._ctx)
            except TypeError:
                continue
            sdf.createOrReplaceTempView(f"{name}__{tname}")

    def deregister_schema(self, name: str, cascade: bool = True) -> None:
        """Remove a registered schema provider (or hide the default
        ``public`` schema) and drop its materialized views."""
        if self._ctx is not None:
            if name in ("public", "default"):
                self._ctx._public_deregistered = True
            getattr(self._ctx, "_schema_providers", {}).pop(name, None)
        for t in self._spark.catalog.listTables():
            if t.name.startswith(f"{name}__"):
                self._spark.catalog.dropTempView(t.name)

    @staticmethod
    def memory_catalog() -> "InMemoryCatalogProvider":
        """A fresh in-memory catalog (ref catalog.py Catalog.memory_catalog)."""
        return InMemoryCatalogProvider()

    def __repr__(self) -> str:
        return f"Catalog({self.name})"
