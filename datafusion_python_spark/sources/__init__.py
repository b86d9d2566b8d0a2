"""Source/sink helpers beyond the SessionContext read_* surface.

Covers the reference's listing-table / partitioned-layout features
(SURVEY §2.1): hive-partitioned writes + partition-discovering reads,
and object-store path handling notes. On a cluster these same calls
target s3a://, gs://, abfss:// — connector config, not code.
"""

from .avro import read_avro
from .listing import partitioned_write, read_listing_table, read_partitioned

__all__ = ["partitioned_write", "read_avro", "read_listing_table", "read_partitioned"]
