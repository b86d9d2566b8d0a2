"""File-location input plugin (ref python/datafusion/input/location.py).

Resolves a path string into :class:`~..common.SqlTable` metadata by
reading the file's own footer/header: parquet via the pyarrow footer
(column physical types + exact row count, no data scan — the same
approach the reference takes), CSV via the header row. Globs expand to
multi-file tables.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from ..common import DataTypeMap, SqlTable
from .base import BaseInputSource


class LocationInputPlugin(BaseInputSource):
    """Input plugin for file locations on disk or remote (ref
    location.py:27)."""

    def is_correct_input(self, input_item: Any, table_name: str, **kwargs: Any) -> bool:
        return isinstance(input_item, str)

    def build_table(self, input_item: str, table_name: str, **kwargs: Any) -> SqlTable:
        file_format = Path(input_item).suffix.lstrip(".").lower()
        num_rows = 0
        columns: list[tuple[str, DataTypeMap]] = []
        if file_format == "parquet":
            import pyarrow.parquet as pq

            metadata = pq.read_metadata(input_item)
            num_rows = metadata.num_rows
            columns = [
                (
                    metadata.schema.column(i).name,
                    DataTypeMap.from_parquet_type_str(
                        metadata.schema.column(i).physical_type
                    ),
                )
                for i in range(metadata.num_columns)
            ]
        elif file_format == "csv":
            import csv

            with Path(input_item).open() as file:
                reader = csv.reader(file)
                header_row = next(reader)
                for _ in reader:
                    num_rows += 1
            columns = [
                (name, DataTypeMap.arrow_str("utf8")) for name in header_row
            ]
        else:
            msg = (
                f"Input of format: `{file_format}` is currently not supported. "
                "Only Parquet and CSV."
            )
            raise RuntimeError(msg)

        input_path = Path(input_item)
        input_files = [str(p) for p in input_path.parent.glob(input_path.name)]
        return SqlTable(table_name, columns, num_rows, input_files)
