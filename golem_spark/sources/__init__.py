"""Source/sink helpers: format readers, bucketed writes, and import-try
stubs for table formats whose jars aren't in this image."""

from golem_spark.sources.io import (
    read_table,
    write_bucketed,
    write_partitioned,
)

__all__ = ["read_table", "write_bucketed", "write_partitioned"]
