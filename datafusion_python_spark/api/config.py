"""Session/runtime configuration surface (ref context.py:148-472
SessionConfig/RuntimeEnvBuilder, options.py:39 CsvReadOptions).

SessionConfig's knobs map onto Spark SQL confs where an equivalent
exists; knobs that configure DataFusion's own scheduler internals
(batch size, repartition-per-operator toggles) map to the nearest Spark
concept or are recorded but inert, documented per method. The collected
confs are applied by ``SessionContext`` at construction.
"""

from __future__ import annotations

import pathlib


class SessionConfig:
    """Builder for session options (ref context.py:148)."""

    def __init__(self, config_options: dict[str, str] | None = None) -> None:
        self.spark_conf: dict[str, str] = dict(config_options or {})
        self.default_catalog = "spark_catalog"
        self.default_schema = "default"

    def set(self, key: str, value: str) -> "SessionConfig":
        self.spark_conf[key] = str(value)
        return self

    def with_create_default_catalog_and_schema(self, enabled: bool = True) -> "SessionConfig":
        return self  # Spark always provides spark_catalog/default

    def with_default_catalog_and_schema(self, catalog: str, schema: str) -> "SessionConfig":
        self.default_catalog = catalog
        self.default_schema = schema
        return self

    def with_information_schema(self, enabled: bool = True) -> "SessionConfig":
        return self  # Spark exposes catalog metadata via SHOW/DESCRIBE natively

    def with_batch_size(self, batch_size: int) -> "SessionConfig":
        # nearest Spark concept: columnar batch size for parquet readers
        self.spark_conf["spark.sql.parquet.columnarReaderBatchSize"] = str(batch_size)
        self.spark_conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(batch_size)
        return self

    def with_target_partitions(self, target_partitions: int) -> "SessionConfig":
        self.spark_conf["spark.sql.shuffle.partitions"] = str(target_partitions)
        return self

    def with_repartition_aggregations(self, enabled: bool = True) -> "SessionConfig":
        return self  # Catalyst always plans partial->final aggregation

    def with_repartition_joins(self, enabled: bool = True) -> "SessionConfig":
        return self  # join repartitioning is Catalyst's job

    def with_repartition_windows(self, enabled: bool = True) -> "SessionConfig":
        return self

    def with_repartition_sorts(self, enabled: bool = True) -> "SessionConfig":
        return self

    def with_repartition_file_scans(self, enabled: bool = True) -> "SessionConfig":
        return self

    def with_repartition_file_min_size(self, size: int) -> "SessionConfig":
        self.spark_conf["spark.sql.files.maxPartitionBytes"] = str(size)
        return self

    def with_parquet_pruning(self, enabled: bool = True) -> "SessionConfig":
        self.spark_conf["spark.sql.parquet.filterPushdown"] = str(enabled).lower()
        return self

    def with_extension(self, extension) -> "SessionConfig":
        raise NotImplementedError(
            "SessionConfig.with_extension carries DataFusion FFI extensions; "
            "Spark extensions are JVM-side (spark.sql.extensions)"
        )


class RuntimeEnvBuilder:
    """Runtime memory/disk knobs (ref context.py:355-472). Spark manages
    spill and memory pools itself; the mappable knobs translate to Spark
    confs, the rest are recorded no-ops documented here (memory pools →
    executor memory fractions are cluster-submit settings, not session
    settings, in Spark)."""

    def __init__(self) -> None:
        self.spark_conf: dict[str, str] = {}

    def with_disk_manager_disabled(self) -> "RuntimeEnvBuilder":
        return self  # Spark always spills to disk; cannot disable per session

    def with_disk_manager_os(self) -> "RuntimeEnvBuilder":
        return self

    def with_disk_manager_specified(self, *paths: str | pathlib.Path) -> "RuntimeEnvBuilder":
        self.spark_conf["spark.local.dir"] = ",".join(str(p) for p in paths)
        return self

    def with_unbounded_memory_pool(self) -> "RuntimeEnvBuilder":
        return self

    def with_fair_spill_pool(self, size: int) -> "RuntimeEnvBuilder":
        return self  # Spark's UnifiedMemoryManager is already fair-sharing

    def with_greedy_memory_pool(self, size: int) -> "RuntimeEnvBuilder":
        return self

    def with_temp_file_path(self, path: str | pathlib.Path) -> "RuntimeEnvBuilder":
        self.spark_conf["spark.local.dir"] = str(path)
        return self


def _single_char(name: str, value: str | None) -> None:
    if value is not None and len(value) != 1:
        raise ValueError(f"{name} must be a single character, got {value!r}")


class CsvReadOptions:
    """CSV reader options (ref options.py:39), mapped to Spark's CSV
    datasource options via ``kwargs()`` / ``spark_options()``."""

    def __init__(
        self,
        *,
        has_header: bool = True,
        delimiter: str = ",",
        quote: str = '"',
        terminator: str | None = None,
        escape: str | None = None,
        comment: str | None = None,
        newlines_in_values: bool = False,
        schema=None,
        schema_infer_max_records: int = 1000,
        file_extension: str = ".csv",
        table_partition_cols: list | None = None,
        file_compression_type: str = "",
        file_sort_order: list | None = None,
        null_regex: str | None = None,
        truncated_rows: bool = False,
    ) -> None:
        _single_char("delimiter", delimiter)
        _single_char("quote", quote)
        _single_char("terminator", terminator)
        _single_char("escape", escape)
        _single_char("comment", comment)
        self.has_header = has_header
        self.delimiter = delimiter
        self.quote = quote
        self.terminator = terminator
        self.escape = escape
        self.comment = comment
        self.newlines_in_values = newlines_in_values
        self.schema = schema
        self.schema_infer_max_records = schema_infer_max_records
        self.file_extension = file_extension
        self.table_partition_cols = table_partition_cols
        self.file_compression_type = file_compression_type
        self.null_regex = null_regex
        self.truncated_rows = truncated_rows
        self.file_sort_order = file_sort_order

    # reference-style with_* chaining (options.py builder pattern)
    def _with(self, **kv) -> "CsvReadOptions":
        for k, v in kv.items():
            setattr(self, k, v)
        return self

    def with_has_header(self, has_header: bool = True) -> "CsvReadOptions":
        return self._with(has_header=has_header)

    def with_delimiter(self, delimiter: str) -> "CsvReadOptions":
        _single_char("delimiter", delimiter)
        return self._with(delimiter=delimiter)

    def with_quote(self, quote: str) -> "CsvReadOptions":
        _single_char("quote", quote)
        return self._with(quote=quote)

    def with_escape(self, escape: str | None) -> "CsvReadOptions":
        _single_char("escape", escape)
        return self._with(escape=escape)

    def with_comment(self, comment: str | None) -> "CsvReadOptions":
        _single_char("comment", comment)
        return self._with(comment=comment)

    def with_terminator(self, terminator: str | None) -> "CsvReadOptions":
        _single_char("terminator", terminator)
        return self._with(terminator=terminator)

    def with_newlines_in_values(self, newlines_in_values: bool = True) -> "CsvReadOptions":
        return self._with(newlines_in_values=newlines_in_values)

    def with_schema(self, schema) -> "CsvReadOptions":
        return self._with(schema=schema)

    def with_file_extension(self, file_extension: str) -> "CsvReadOptions":
        return self._with(file_extension=file_extension)

    def with_schema_infer_max_records(self, n: int) -> "CsvReadOptions":
        return self._with(schema_infer_max_records=n)

    def with_table_partition_cols(self, cols: list) -> "CsvReadOptions":
        return self._with(table_partition_cols=cols)

    def with_file_sort_order(self, order: list) -> "CsvReadOptions":
        return self._with(file_sort_order=order)

    def with_file_compression_type(self, t: str) -> "CsvReadOptions":
        return self._with(file_compression_type=t)

    def with_null_regex(self, null_regex: str | None) -> "CsvReadOptions":
        return self._with(null_regex=null_regex)

    def with_truncated_rows(self, truncated_rows: bool = True) -> "CsvReadOptions":
        return self._with(truncated_rows=truncated_rows)

    def spark_options(self) -> dict[str, str]:
        opts = {
            "header": str(self.has_header).lower(),
            "sep": self.delimiter,
            "quote": self.quote,
            "multiLine": str(self.newlines_in_values).lower(),
            "samplingRatio": "1.0",
        }
        if self.terminator:
            opts["lineSep"] = self.terminator
        if self.escape:
            opts["escape"] = self.escape
        if self.comment:
            opts["comment"] = self.comment
        if self.truncated_rows:
            opts["mode"] = "PERMISSIVE"
        if self.null_regex:
            # Spark's nullValue matches literal tokens; plain literals map
            # there (nulls apply before type inference). Real regexes are
            # applied post-read by read_csv to string columns.
            import re as _re

            if _re.fullmatch(r"[A-Za-z0-9 _\-.]*", self.null_regex):
                opts["nullValue"] = self.null_regex
        return opts

    def kwargs(self) -> dict:
        """kwargs for SessionContext.read_csv."""
        return {
            "schema": self.schema,
            "has_header": self.has_header,
            "delimiter": self.delimiter,
            "schema_infer_max_records": self.schema_infer_max_records,
            "file_extension": self.file_extension,
            "table_partition_cols": self.table_partition_cols,
            "file_compression_type": self.file_compression_type or None,
        }


class InsertOp:
    """Write disposition constants (ref dataframe.py InsertOp)."""

    APPEND = "append"
    OVERWRITE = "overwrite"
    REPLACE = "replace"


import enum


class ExplainFormat(enum.Enum):
    """Explain output formats (ref dataframe.py ExplainFormat)."""

    INDENT = "indent"
    TREE = "tree"
    PGJSON = "pgjson"
    GRAPHVIZ = "graphviz"
