"""Record-batch streaming surface (ref python/datafusion/record_batch.py).

``RecordBatchStream`` supports both sync (``for batch in stream`` /
``stream.next()``) and async (``async for``) iteration, yielding
``RecordBatch`` wrappers whose ``to_pyarrow()`` returns the underlying
``pyarrow.RecordBatch`` — the same shape the reference exposes
(record_batch.py:23-70, dataframe.py:1681/1689/1821).

Spark mapping: batches are produced from ``toLocalIterator`` in bounded
chunks, so a stream over a huge result keeps driver memory flat — rows
flow partition-by-partition from executors. The partitioned variant tags
rows with ``spark_partition_id()`` so per-partition streams preserve the
executor partitioning.
"""

from __future__ import annotations

from typing import Iterator


class RecordBatch:
    """Thin wrapper over pyarrow.RecordBatch (ref record_batch.py:23)."""

    def __init__(self, batch) -> None:
        self._batch = batch

    def to_pyarrow(self):
        return self._batch

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"RecordBatch(num_rows={self._batch.num_rows})"


class RecordBatchStream:
    """Sync + async iterator of RecordBatch (ref record_batch.py:70)."""

    def __init__(self, batches: Iterator) -> None:
        self._it = iter(batches)

    def next(self) -> RecordBatch:
        return RecordBatch(next(self._it))

    def __iter__(self) -> "RecordBatchStream":
        return self

    def __next__(self) -> RecordBatch:
        return RecordBatch(next(self._it))

    def __aiter__(self) -> "RecordBatchStream":
        return self

    async def __anext__(self) -> RecordBatch:
        try:
            return RecordBatch(next(self._it))
        except StopIteration:
            raise StopAsyncIteration from None


def arrow_batch_iter(df, rows_per_batch: int = 8192, layout=None):
    """Convert a Spark DataFrame into pyarrow batches incrementally.

    toLocalIterator pulls one partition at a time to the driver, so peak
    memory is one partition + one batch, independent of result size.
    ``layout`` (flat list of original batch row counts, from an explicit
    MemTable registration) reproduces the source's exact batch
    boundaries; otherwise partition boundaries become batch boundaries.
    """
    import pyarrow as pa

    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = to_arrow_schema(df.schema)
    except Exception:  # pragma: no cover - fallback on API drift
        schema = None

    # partition boundaries become batch boundaries (the reference's
    # stream yields one batch per MemTable partition batch); rows are
    # tagged with their partition id and a batch is cut on change
    from pyspark.sql import functions as F

    cuts = list(layout) if layout else None
    tagged = df.withColumn("__pid", F.spark_partition_id())
    buf: list[dict] = []
    cur_pid = None
    for row in tagged.toLocalIterator():
        d = row.asDict(recursive=True)
        pid = d.pop("__pid")
        limit = cuts[0] if cuts else rows_per_batch
        if buf and (pid != cur_pid or len(buf) >= limit):
            yield pa.RecordBatch.from_pylist(buf, schema=schema)
            if cuts:
                cuts.pop(0)
            buf = []
        cur_pid = pid
        buf.append(d)
    if buf:
        yield pa.RecordBatch.from_pylist(buf, schema=schema)
