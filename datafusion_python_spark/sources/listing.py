"""Listing tables: directories of files with hive-style partitioning.

ref: register_listing_table (context.py:655), table_partition_cols on
every read_* (context.py:1062). Spark's DataSource framework does the
partition discovery + pruning; these helpers standardize the layout so
partition filters prune directories (visible as PartitionFilters in
.explain) rather than reading and discarding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a hive-partitioned layout (dir per partition value).

    At 100 TB choose low-cardinality partition columns (date, source) and
    cap file count with maxRecordsPerFile so small-file storms don't
    swamp the namenode/object store listing.
    """
    w = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    getattr(w, fmt)(path)


def read_listing_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory-of-files table with partition-column discovery."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return getattr(reader, fmt)(path)


def read_partitioned(
    spark: SparkSession, path: str, partition_filter: str | None = None, fmt: str = "parquet"
) -> DataFrame:
    """Read with an immediate partition predicate so pruning happens at
    planning time (check PartitionFilters in .explain("formatted"))."""
    df = getattr(spark.read, fmt)(path)
    return df.filter(partition_filter) if partition_filter else df
