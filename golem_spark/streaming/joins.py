"""Watermarked stream-stream join: the funnel/attribution pattern
(click -> purchase by the same user within a bounded time window).

Both sides carry watermarks and the join predicate bounds event time on
BOTH sides, so Spark can expire join state: without the time bound the
left side's state would grow without limit waiting for arbitrarily-late
matches — the classic unbounded-state bug in streaming joins. With it,
state is O(events inside the watermark horizon) regardless of stream
length, which is what makes the operator run forever at production
rates.

Batch equivalence: the same join predicate over the static table is the
ground truth the tests compare against (stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from golem_spark.streaming.scoring import EVENTS_SCHEMA
from golem_spark.streaming.windows import _with_event_time


def funnel_join(clicks: DataFrame, purchases: DataFrame,
                max_gap_minutes: int = 60,
                watermark: str = "2 hours") -> DataFrame:
    """Pairs each click with the same user's purchases that happen
    within (0, max_gap_minutes] after it. Works on streaming inputs
    (watermark + two-sided time-bound predicate -> bounded state) and
    on static frames (same predicate, no watermark)."""
    a = _with_event_time(clicks).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("event_time").alias("click_time"))
    b = _with_event_time(purchases).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("value").alias("purchase_value"),
        F.col("event_time").alias("purchase_time"))
    if a.isStreaming:
        a = a.withWatermark("click_time", watermark)
    if b.isStreaming:
        b = b.withWatermark("purchase_time", watermark)
    cond = (
        (a["user_id"] == b["p_user_id"])
        & (b["purchase_time"] > a["click_time"])
        & (b["purchase_time"]
           <= a["click_time"] + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")))
    return (a.join(b, cond)
            .select("click_id", "purchase_id", "user_id",
                    "click_time", "purchase_time", "purchase_value"))


def run_funnel_stream(spark: SparkSession, events_path: str,
                      max_gap_minutes: int = 60,
                      query_name: str = "funnel") -> DataFrame:
    """Drive the stream-stream join over all available events
    synchronously (memory sink, append mode — stream-stream inner joins
    emit matches as watermarks close)."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.load(events_path)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = funnel_join(clicks, purchases, max_gap_minutes)
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
