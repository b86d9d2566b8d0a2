"""Bucketed tables: pre-shuffled storage for repeat-join workloads, and
small-file compaction for long-lived corpora.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark
bucketing pays that shuffle ONCE at write: rows are hash-distributed
into a fixed number of buckets by the join key, and any later join or
aggregation on that key reads co-located buckets with NO exchange —
the managed-table analogue of the reference's partitioned listing
tables. Both sides must share (key, bucket count).

Small-file compaction is the other storage chore a continuously
ingested corpus needs: thousands of tiny parquet files from incremental
appends destroy scan throughput (footer/open overhead per file,
undersized row groups). Compaction rewrites a directory to
size-targeted files in one distributed pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save as a bucketed (optionally sorted) managed table.

    ``sort_cols`` additionally sorts within each bucket, which tightens
    min/max stats and enables sort-merge reads without a sort stage.
    """
    if mode == "overwrite":
        # saveAsTable(overwrite) still refuses a managed-table location
        # left behind by a dropped/crashed session — clean both catalog
        # entry and orphan directory so overwrite means overwrite.
        # The location comes from the catalog BEFORE the drop (a
        # qualified db.table lives at warehouse/<db>.db/<name>, not
        # warehouse/<name> — deriving it from the last name component
        # would aim at the default database's same-named table).
        spark = df.sparkSession
        loc = None
        try:
            rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            meta = {r["col_name"]: r["data_type"] for r in rows}
            raw = meta.get("Location")
            if raw and raw.startswith(("file:", "/")):
                loc = raw.removeprefix("file:")
        except Exception:
            pass  # not in the catalog — maybe an orphan dir, handled below
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if loc is None:
            # orphan from a crashed session: reconstruct the DEFAULT
            # managed location (warehouse/<db>.db/<name>; default-db and
            # unqualified tables sit directly under the warehouse root)
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            parts = table.lower().split(".")
            if len(parts) == 1 or parts[-2] == "default":
                loc = os.path.join(warehouse, parts[-1])
            else:
                loc = os.path.join(warehouse, f"{parts[-2]}.db", parts[-1])
        if loc and os.path.isdir(loc):
            import shutil

            shutil.rmtree(loc)
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True when both tables exist and joining them on their bucket key
    requires no shuffle (same bucket spec). Advisory helper for
    pipeline authors; the plan itself is the ground truth."""
    try:
        desc = {
            t: spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect() for t in (left, right)
        }
    except Exception:
        return False

    def spec(rows):
        d = {r["col_name"]: r["data_type"] for r in rows}
        return (d.get("Num Buckets"), d.get("Bucket Columns"))

    sl, sr = spec(desc[left]), spec(desc[right])
    return sl == sr and sl[0] is not None


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite a directory of (possibly thousands of tiny) files into
    size-targeted ones; returns the new file count.

    File count = ceil(input_bytes / target); the rewrite is a single
    distributed pass (repartition → write to a temp dir → atomic swap).
    Compression typically holds the written size near the target.
    """
    total = 0
    for root, _dirs, files in os.walk(path):
        for f_ in files:
            if not f_.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f_))
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    # atomic-ish swap: move old out, tmp in, drop old
    import shutil

    back = path.rstrip("/") + "__compact_old"
    shutil.move(path, back)
    shutil.move(tmp, path)
    shutil.rmtree(back)
    return n_files
