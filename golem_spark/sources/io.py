"""Readers and writers.

- ``read_table``: one entry point over parquet/orc/csv/json with
  explicit schemas (no inference in production paths) — parquet gets
  pushdown + pruning from Catalyst for free.
- ``write_partitioned``: partition-by-column layout so downstream
  filters prune whole directories.
- ``write_bucketed``: bucketBy(key) saveAsTable so later equi-joins on
  the key co-locate WITHOUT a shuffle — the standing answer to repeated
  big-to-big joins at 100 TB.
- Delta/Iceberg/Hudi need jars not present in this image: the factory
  raises a clear error instead of failing deep in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_LAKE_FORMATS = {"delta", "iceberg", "hudi"}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None, **options) -> DataFrame:
    if fmt in _LAKE_FORMATS:
        try:
            return spark.read.format(fmt).options(**options).load(path)
        except Exception as e:  # jar missing
            raise ImportError(
                f"{fmt} requires its connector jars on the Spark classpath "
                f"(not present in this image): {e}") from e
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite", fmt: str = "parquet") -> None:
    (df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path))


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Persist bucketed (+ optionally sorted) so joins/aggs on
    ``bucket_col`` skip the shuffle."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
