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

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def shard_assign(df: DataFrame, key_col: str, n_shards: int,
                 seed: int = 0) -> DataFrame:
    """Deterministic content-hash shard id (md5 60-bit of key||seed mod
    n_shards) as a ``__shard`` column — the same engine-portable hash
    rule as the sampling/split operators, so a re-run, a different
    partitioning, or a different engine produces byte-identical shard
    membership (what makes incremental corpus rebuilds and resumable
    training-data jobs possible). Pure column expression."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "_", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 15),
        16, 10).cast("long")
    return df.withColumn("__shard", h % n_shards)


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int = 64, sort_col: str | None = None,
                          seed: int = 0, mode: str = "overwrite") -> None:
    """Materialize a curated corpus as deterministic training shards:
    one hash-shard directory each (``__shard=K/``), rows sorted within
    the shard by ``sort_col`` (default the key) so output files are
    reproducible byte streams. ``repartition(n_shards, __shard)``
    aligns task == shard, so each shard is written by exactly one task
    (no tiny-file explosion) and readers get per-shard parallelism."""
    sharded = shard_assign(df, key_col, n_shards, seed=seed)
    # sort by ("__shard", sort_col): partitionBy requires the writer's
    # rows ordered by the partition column — satisfying it here keeps
    # the within-shard sort_col order an API contract rather than a
    # property of whichever (possibly unstable) sort the planner inserts
    (sharded.repartition(n_shards, F.col("__shard"))
     .sortWithinPartitions("__shard", sort_col or key_col)
     .write.mode(mode).partitionBy("__shard").parquet(path))


def shard_manifest(df: DataFrame, key_col: str, n_shards: int,
                   weight_col: str | None = None,
                   seed: int = 0) -> DataFrame:
    """The data card for a shard layout: per shard, row count, total
    weight (e.g. chars/tokens), key range, and load share in exact ppm
    (floor(rows * 1e6 / total) — integer, order-independent). ONE
    combinable groupBy over <= n_shards keys + a broadcast scalar
    total; the skew check for 'does this layout balance at 100 TB'."""
    sharded = shard_assign(df, key_col, n_shards, seed=seed)
    w = F.col(weight_col) if weight_col else F.lit(1)
    per = (sharded.groupBy("__shard")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(w).cast("long").alias("sum_weight"),
                F.min(key_col).alias("min_key"),
                F.max(key_col).alias("max_key")))
    tot = per.agg(F.sum("n_rows").alias("__tot"))
    return (per.crossJoin(F.broadcast(tot))
            .select(F.col("__shard").alias("shard"), "n_rows", "sum_weight",
                    "min_key", "max_key",
                    # integer `div`, matching the oracle's `//`: floating
                    # floor(a*1e6/b) can differ by one ulp near integer
                    # quotients or past 2^53 micro-units
                    F.expr("(n_rows * 1000000L) div __tot")
                    .cast("long").alias("load_ppm"))
            .orderBy("shard"))
