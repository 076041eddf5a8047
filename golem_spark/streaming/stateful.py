"""Custom stateful streaming operator: per-user running score state via
applyInPandasWithState.

Demonstrates the pattern the built-in windowed aggregations can't
express: arbitrary per-key state (here a running count / sum / last-seen
timestamp and a running model-score mean) carried across micro-batches
with explicit state schema. At scale the state store is partitioned by
the grouping key, so state size is O(distinct users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from golem_spark.streaming.scoring import EVENTS_SCHEMA

OUTPUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
                 "avg_score double, last_ts long")
STATE_SCHEMA = "n long, sum_value double, sum_score double, last_ts long"

# the fixed fitted model (matches streaming/scoring.py::score_expr)
_B0, _B1 = -1.0, 0.01


def _update_user_state(key, pdfs: Iterable[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    import math

    (user_id,) = key
    if state.exists:
        n, sum_value, sum_score, last_ts = state.get
    else:
        n, sum_value, sum_score, last_ts = 0, 0.0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        sum_value += float(pdf["value"].sum())
        sum_score += float((1.0 / (1.0 + (-( _B1 * pdf["value"] + _B0)).apply(math.exp))).sum())
        if len(pdf):
            ts = pdf["ts"]
            # native timestamp batches arrive as datetime64 — keep the
            # state long-typed as epoch micros
            if ts.dtype.kind == "M":
                ts = ts.astype("datetime64[us]").astype("int64")
            last_ts = max(last_ts, int(ts.max()))
    state.update((n, sum_value, sum_score, last_ts))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [sum_value],
        "avg_score": [sum_score / n if n else 0.0],
        "last_ts": [last_ts],
    })


def stateful_user_scores(events: DataFrame) -> DataFrame:
    """Streaming: running per-user aggregates with explicit state."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _update_user_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_stateful_stream(spark: SparkSession, events_path: str,
                        query_name: str = "user_scores") -> DataFrame:
    """Drive the stateful operator over all available events; the memory
    sink keeps the LAST update per user (update mode appends — dedup by
    max n_events per user when reading)."""
    import os

    from pyspark.sql import functions as F

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    stream = reader.load(events_path)
    out = stateful_user_scores(stream)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    latest = spark.sql(f"SELECT * FROM {query_name}")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (latest.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
