"""SparkSession factory tuned for the local[32] test harness.

On a real cluster these configs are supplied by spark-submit; the factory
only sets session-level SQL knobs (AQE, shuffle partitions, Arrow) that are
correct at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "golem_spark", shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize per-batch Python overhead in the
        # mapInPandas partial-reduction passes (default 10k)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # spark.sql.codegen.maxFields stays at the Spark default (100)
        # ON PURPOSE — both directions were measured (round 12):
        # raising it to 500 made a 200-column x 2e6-row tall scan 2.8x
        # faster (17.0 -> 6.0 s, whole-stage codegen re-enabled), but
        # REGRESSED the iterative GLM bench queries 15-80% at sf0.1
        # (glm_cv_gaussian 1.46 -> 2.74 s, glm_poisson_wide_sparse
        # 3.56 -> 5.84 s warm): every prox-Newton/ADMM pass embeds new
        # beta literals, so each pass pays Janino compilation of the
        # 100-500-field generated code that interpreted mode skips.
        # Tall single-pass scans opt in locally via
        # spark.conf.set("spark.sql.codegen.maxFields", "500")
        # (tools/scale_audit.py tall_n_ceiling does). Never set it
        # above ~500: at ~800 generated agg fields Spark 4.1 codegen
        # splits into a nested class that hits a Janino
        # IllegalAccessError on BufferedRowIterator.partitionIndex.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as long and rebuild micros in load_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_REGISTERED: dict[tuple[int, str], dict] = {}


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True):
    """Load the driver-generated parquet tables (TESTDATA.md) as DataFrames.

    Parquet scans get predicate pushdown + column pruning from Catalyst for
    free; callers should select only needed columns so ReadSchema stays
    narrow.
    """
    cache_key = (id(spark), sf_dir)
    if register_views and cache_key in _REGISTERED:
        return _REGISTERED[cache_key]
    # the caller may hand us a session built without our factory (the
    # driver's verify does); the nanos conf is runtime-settable
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos-as-long → truncate to microseconds (same truncation
            # DuckDB applies when materializing its ns timestamps).
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    if register_views:
        _REGISTERED[cache_key] = dfs
    return dfs
