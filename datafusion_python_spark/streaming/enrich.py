"""Stream-static enrichment: join a stream against dimension tables.

The standard streaming-ETL shape: events flow, dimensions sit in
parquet/Delta and change slowly. A stream-static join needs NO
watermark and keeps no join state — each micro-batch joins against the
static side's current snapshot, and broadcasting the dimension keeps
the stream map-side (no shuffle of the stream, the property that
matters when the stream is the 100 TB/day side).

``refresh`` note: Spark re-plans the static side per micro-batch, so a
dimension table overwritten in place is picked up on the next batch —
the cheap slowly-changing-dimension pattern. For point-in-time-correct
(SCD2) enrichment, pre-filter the dimension to the effective window and
join on key + validity range instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
    prefix: str = "",
) -> DataFrame:
    """Join a streaming DataFrame with a static dimension.

    ``prefix`` renames the dimension's non-key columns to avoid
    collisions (e.g. ``prefix="u_"``). Broadcast is on by default —
    stream-static joins with a shuffled static side would re-exchange
    the stream every micro-batch.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in dim.columns if c not in keys]
    renamed = dim.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    right = F.broadcast(renamed) if broadcast_dim else renamed
    return stream.join(right, keys, how)


def scd2_enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    prefix: str = "",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension.

    Matches each event to the dimension version whose
    ``[valid_from, valid_to)`` interval covers the event time (open
    ``valid_to`` = NULL means current). Inner semantics on the validity
    check, left on the key: events with no covering version keep nulls.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [
        c for c in dim.columns if c not in (*keys, valid_from, valid_to)
    ]
    renamed = dim.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    ev_t = stream[ts_col]
    cond = (ev_t >= F.col("__vf")) & (
        F.col("__vt").isNull() | (ev_t < F.col("__vt"))
    )
    for k in keys:
        cond = cond & (stream[k] == F.col(f"__k_{k}"))
    # validity inside the LEFT condition: events with no covering
    # version survive with null payload (never silently dropped)
    return stream.join(F.broadcast(renamed), cond, how="left").drop(
        *[f"__k_{k}" for k in keys], "__vf", "__vt"
    )
