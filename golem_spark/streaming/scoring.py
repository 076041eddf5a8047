"""Structured Streaming incremental model scoring (kernel K20's
streaming twin).

A fitted model's linear predictor + link is a pure column expression, so
scoring a stream is just the same select over readStream. The aggregated
per-event-type running scores use update-mode aggregation (or
foreachBatch for exactly-once sinks). The batch query (K20) is the
correctness oracle: processing all available data through the stream
must equal the one-shot batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),  # parquet timestamp[us]
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def score_expr(value_col: str = "value", b0: float = -1.0, b1: float = 0.01):
    """sigmoid(b1*value + b0) — a fixed fitted binomial model's response."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b1) * F.col(value_col) + F.lit(b0))))


def stream_event_scores(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over the events parquet data -> per-event-type
    aggregated score. ``events_dir`` may be a directory or a single
    parquet file (file streaming sources need a directory, so a file
    path is split into parent + glob)."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if events_dir.endswith(".parquet") and os.path.isfile(events_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        events_dir = os.path.dirname(events_dir)
    stream = reader.load(events_dir)
    return (stream
            .withColumn("score", score_expr())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg("score").alias("avg_score"),
                 F.sum("value").alias("sum_value")))


def run_stream_to_memory(spark: SparkSession, events_dir: str,
                         query_name: str = "event_scores") -> DataFrame:
    """Drive the stream over all currently-available files synchronously
    (the local test harness for the streaming operator); returns the
    final in-memory table."""
    agg = stream_event_scores(spark, events_dir)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
