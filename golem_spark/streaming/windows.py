"""Watermarked windowed aggregation over the events stream.

The late-data pattern for 100 TB event streams: event-time tumbling
windows + a watermark bounding state, per-type counts/sums/model scores.
Batch equivalence: running the same window expressions over the static
table gives the ground truth the tests compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from golem_spark.streaming.scoring import EVENTS_SCHEMA, score_expr


def _with_event_time(df: DataFrame) -> DataFrame:
    # ts is a native timestamp (parquet timestamp[us]); if a legacy
    # source delivers nanos-as-long instead, rebuild micros from it
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("event_time",
                             F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df.withColumn("event_time", F.col("ts").cast("timestamp"))


def windowed_event_stats(df: DataFrame, window: str = "1 hour",
                         watermark: str | None = "2 hours") -> DataFrame:
    """Tumbling-window per-type stats; watermark only applies on
    streaming inputs."""
    src = _with_event_time(df)
    if watermark and src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (src
            .groupBy(F.window("event_time", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value"),
                 F.avg(score_expr()).alias("avg_score"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "sum_value", "avg_score"))


def run_windowed_stream(spark: SparkSession, events_path: str,
                        window: str = "1 hour",
                        query_name: str = "event_windows") -> DataFrame:
    """Drive the windowed aggregation over all available events
    synchronously (memory sink), mirroring run_stream_to_memory."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.load(events_path)
    agg = windowed_event_stats(stream, window)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def session_stats(df: DataFrame, gap: str = "1800 seconds",
                  watermark: str | None = "2 hours") -> DataFrame:
    """Per-user SESSION windows (gap-based, Structured Streaming's
    session_window): one output row per (user, session) with event
    count and session bounds. The built-in session-window state merges
    adjacent windows as events arrive and is bounded by the watermark
    horizon — the streaming twin of operators.relational.sessionize.

    Boundary note vs the batch operator: sessionize starts a new
    session when the inter-event gap is STRICTLY greater than the gap;
    session_window merges events strictly closer than the gap — the two
    differ only when a gap equals the threshold exactly (measure-zero
    for real event times)."""
    src = _with_event_time(df)
    if watermark and src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (src
            .groupBy("user_id",
                     F.session_window("event_time", gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def run_session_stream(spark: SparkSession, events_path: str,
                       gap: str = "1800 seconds",
                       query_name: str = "event_sessions") -> DataFrame:
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.load(events_path)
    agg = session_stats(stream, gap)
    # session-window aggregations reject update mode (windows merge);
    # complete mode re-emits the final session table
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
