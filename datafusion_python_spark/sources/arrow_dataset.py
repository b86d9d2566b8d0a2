"""In-memory PyArrow dataset scans with filter pushdown (ref
crates/core/src/dataset_exec.rs:80-108, pyarrow_filter_expression.rs:34-49).

The reference wraps any ``pyarrow.dataset.Dataset`` in an ExecutionPlan
that forwards the query's filters/projection into the dataset scanner.
File-backed parquet datasets already get that for free here via Spark's
native reader (``SessionContext.register_dataset``); this module covers
the rest — in-memory (and otherwise non-file) datasets — through Spark
4's Python DataSource API:

- ``pushFilters`` receives the query's Catalyst filters (as the public
  ``pyspark.sql.datasource.Filter`` dataclasses), translates every
  supported one into a ``pyarrow.dataset.Expression`` (the translation
  table of the reference's pyarrow_filter_expression.rs) and returns the
  untranslatable remainder for Spark to re-apply post-scan;
- ``read`` runs the dataset scanner WITH that filter and streams Arrow
  record batches straight into Spark's vectorized path — rows the filter
  drops are never materialized into Spark.

The Python DataSource API has no column-pruning hook (filters only), so
projection trims in Spark after the scan; for in-memory data the scan is
a zero-copy table view, making pushed filters the part that matters.

Python data sources run in separate worker processes, so the dataset is
bound into the generated DataSource class — cloudpickle ships it with
the class to the planning worker and executor tasks (driver memory pages
for in-memory data: the intended shape). Scan telemetry (pushed/rejected
filters, scanned row count) is appended as JSON lines to an optional
stats file, the only channel back from worker processes; tests use it to
prove the filter actually reached the scanner.
"""

from __future__ import annotations

import json
from typing import Any


def _to_arrow_expr(f, schema=None):
    """One pyspark Filter dataclass → pyarrow.dataset Expression, or None
    when the predicate has no scanner form (mirrors
    pyarrow_filter_expression.rs:34-49's operator table). Nested column
    refs are rejected (the reference's DatasetExec doesn't push them
    either); datetime literals are cast to the declared field type so the
    scanner's comparison kernel binds (s/us scalars vs ns columns)."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    from pyspark.sql import datasource as dsf

    def field(attr):
        if len(attr) != 1:
            raise _Unsupported  # nested refs: no scanner pushdown
        if schema is not None and attr[0] not in schema.names:
            raise _Unsupported
        return pads.field(attr[0])

    def val(attr, v):
        import datetime as _dt

        if schema is not None and isinstance(v, (_dt.datetime, _dt.date)):
            t = schema.field(attr[0]).type
            if pa.types.is_timestamp(t) or pa.types.is_date(t):
                return pa.scalar(v).cast(t)
        return v

    try:
        if isinstance(f, dsf.EqualTo):
            return field(f.attribute) == val(f.attribute, f.value)
        if isinstance(f, dsf.EqualNullSafe):
            return None  # scanner == has no NULL-safe semantics
        if isinstance(f, dsf.GreaterThan):
            return field(f.attribute) > val(f.attribute, f.value)
        if isinstance(f, dsf.GreaterThanOrEqual):
            return field(f.attribute) >= val(f.attribute, f.value)
        if isinstance(f, dsf.LessThan):
            return field(f.attribute) < val(f.attribute, f.value)
        if isinstance(f, dsf.LessThanOrEqual):
            return field(f.attribute) <= val(f.attribute, f.value)
        if isinstance(f, dsf.In):
            return field(f.attribute).isin(
                [val(f.attribute, v) for v in f.values]
            )
        if isinstance(f, dsf.IsNull):
            return field(f.attribute).is_null()
        if isinstance(f, dsf.IsNotNull):
            return ~field(f.attribute).is_null()
        if isinstance(f, dsf.Not):
            inner = _to_arrow_expr(f.child, schema)
            return None if inner is None else ~inner
        if isinstance(f, dsf.StringStartsWith):
            import pyarrow.compute as pc

            return pc.starts_with(field(f.attribute), f.value)
        if isinstance(f, dsf.StringEndsWith):
            import pyarrow.compute as pc

            return pc.ends_with(field(f.attribute), f.value)
        if isinstance(f, dsf.StringContains):
            import pyarrow.compute as pc

            return pc.match_substring(field(f.attribute), f.value)
    except _Unsupported:
        return None
    return None


class _Unsupported(Exception):
    """Predicate shape the scanner can't express (nested ref etc.)."""


def _log_stats(path: str | None, payload: dict[str, Any]) -> None:
    if not path:
        return
    try:
        with open(path, "a") as fh:
            fh.write(json.dumps(payload) + "\n")
    except Exception:
        pass


def make_datasource_class(dataset, stats_path: str | None = None):
    """Generate a DataSource class with ``dataset`` bound in (data sources
    run in separate worker processes; cloudpickle ships the class state).

    ``InMemoryDataset`` objects don't pickle — for those the underlying
    table (a zero-copy view, already resident) is shipped instead and the
    dataset is rebuilt worker-side, preserving scanner pushdown.
    """
    import pickle

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    arrow_schema = dataset.schema
    try:
        pickle.dumps(dataset)
        payload, is_table = dataset, False
    except Exception:
        payload, is_table = dataset.to_table(), True

    def _open_dataset():
        if not is_table:
            return payload
        import pyarrow.dataset as pads

        return pads.dataset(payload)

    class ArrowDatasetReader(DataSourceReader):
        def __init__(self) -> None:
            self.filter_expr = None

        def pushFilters(self, filters):
            from pyspark.sql.datasource import IsNotNull

            pushed, rejected = [], []
            expr = display = None
            for f in filters:
                e = _to_arrow_expr(f, arrow_schema)
                if e is None:
                    rejected.append(f)
                    continue
                pushed.append(f)
                expr = e if expr is None else expr & e
                if not isinstance(f, IsNotNull):
                    # Catalyst injects IsNotNull guards DataFusion's
                    # planner doesn't — keep them out of the display
                    display = e if display is None else display & e
            self.filter_expr = expr
            _log_stats(
                stats_path,
                {
                    "event": "pushFilters",
                    "pushed": [repr(f) for f in pushed],
                    "rejected": [repr(f) for f in rejected],
                    # pyarrow's Expression repr — the reference's
                    # DatasetExec prints the same string in explain()
                    "filter_expr": str(display) if display is not None else None,
                },
            )
            yield from rejected

        def partitions(self):
            return [InputPartition(0)]

        def read(self, partition):
            import pyarrow as pa

            # Spark's Arrow ingestion is µs-precision; align batch types
            # with the declared (from_arrow_schema-converted) schema
            def _spark_type(t):
                if pa.types.is_timestamp(t) and t.unit == "ns":
                    return pa.timestamp("us", t.tz)
                if pa.types.is_large_string(t):
                    return pa.string()
                if pa.types.is_large_binary(t):
                    return pa.binary()
                return t

            target = pa.schema(
                [pa.field(f.name, _spark_type(f.type), f.nullable) for f in arrow_schema]
            )
            scanner = _open_dataset().scanner(filter=self.filter_expr)
            n = 0
            for batch in scanner.to_batches():
                n += batch.num_rows
                if batch.schema != target:
                    batch = pa.Table.from_batches([batch]).cast(target).to_batches()[0]
                yield batch
            _log_stats(stats_path, {"event": "read", "scanned_rows": n})

    class ArrowDatasetSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "pyarrow_dataset"

        def schema(self):
            from pyspark.sql.pandas.types import from_arrow_schema

            return from_arrow_schema(arrow_schema)

        def reader(self, schema) -> ArrowDatasetReader:
            return ArrowDatasetReader()

    return ArrowDatasetSource


def read_dataset(spark, dataset, stats_path: str | None = None):
    """Register + read an in-memory pyarrow dataset with filter pushdown.

    Each call re-registers the ``pyarrow_dataset`` source bound to THIS
    dataset; DataFrames already loaded keep their own plan, so the
    re-registration only affects subsequent ``read`` calls.
    """
    cls = make_datasource_class(dataset, stats_path)
    # runtime session conf; off by default in Spark 4.1
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(cls)
    return spark.read.format("pyarrow_dataset").load()
