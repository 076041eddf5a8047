"""Streaming exact deduplication: emit each distinct document content
exactly once, on first sight, with per-content state.

The streaming twin of ``pipeline.dedup.exact_dup_groups``: the state
store is keyed by the md5 content hash (state size O(distinct
contents), not O(stream length)); a content hash emits a single keep
row the first micro-batch it appears in and only bumps a duplicate
counter afterwards. Within a micro-batch the kept doc is the minimum
doc_id, so a single-batch run reproduces the batch semantics exactly
(test_streaming_dedup_matches_batch).

At 100 TB-stream scale this is the standard shape: hash-partitioned
state, append output, no shuffle beyond the groupBy(hash).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")
OUTPUT_SCHEMA = "text_hash string, doc_id long"
STATE_SCHEMA = "kept long, n_dups long"


def _dedup_state(key, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (text_hash,) = key
    batch_min = None
    n = 0
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
            n += len(pdf)
    if state.exists:
        kept, n_dups = state.get
        state.update((kept, n_dups + n))
        return  # already emitted: nothing new to append
    state.update((batch_min, n))
    yield pd.DataFrame({"text_hash": [text_hash], "doc_id": [batch_min]})


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """doc stream -> (text_hash, doc_id) keep-rows, first-sight only."""
    hashed = docs.withColumn("text_hash", F.md5(F.col("text")))
    return (hashed.select("text_hash", "doc_id")
            .groupBy("text_hash")
            .applyInPandasWithState(
                _dedup_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_streaming_dedup(spark: SparkSession, docs_path: str,
                        query_name: str = "stream_dedup") -> DataFrame:
    """Drive the dedup over all available document files (memory sink)."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = streaming_exact_dedup(stream)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
