"""Restartable sinks: the operational half of "one pipeline for
backfill and live".

Structured Streaming's exactly-once story is checkpoint + idempotent
sink: offsets and state-store versions commit to the checkpoint
location, and the file sink records committed files in its
``_spark_metadata`` log, so a reader sees each micro-batch's output
exactly once no matter where the previous run died. A restarted query
with the SAME checkpoint resumes from the last committed batch —
re-planning the uncommitted one — which is what makes a 100 TB
streaming ingest safe to preempt, upgrade, and resume.
tests/test_streaming_multimodal.py kills a windowed aggregation
mid-replay and proves the restarted run completes to exactly the batch
answer (no duplicates, no loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_resumable_parquet_sink(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = False,
) -> StreamingQuery:
    """Start ``sdf`` into an exactly-once parquet sink.

    ``checkpoint`` is the resume token: pass the same value to continue
    a previous run (finishing exactly where it stopped); a fresh value
    starts over. ``available_now=True`` runs as an incremental batch
    job (process everything available, respecting per-trigger limits,
    then stop) — the lambda-free backfill trigger.
    """
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
