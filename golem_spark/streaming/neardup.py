"""Streaming NEAR-duplicate detection: MinHash-LSH candidate pairs over
a document stream, with per-bucket state.

The streaming twin of ``pipeline.dedup.minhash_lsh_pairs``. The batch
form computes signatures with an explode + groupBy; a stream cannot put
an aggregation before the stateful operator, so the k=8 signature is
re-expressed as PURE per-row array expressions (array_min over the
transformed distinct-token array — same constants, same values). Band
keys posexplode (stateless), and the stateful step is keyed by the SAME
(lang, len_bucket, band, bkey) bucket key as the batch shuffle — state
per bucket is its member doc_id list, so state size tracks bucket
occupancy (blocking bounds it), not stream length. A new document
emits one candidate row per existing member on arrival: continuous
near-dup detection with cost proportional to true collisions.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from golem_spark.pipeline.dedup import (MINHASH_A, MINHASH_P, N_BANDS,
                                        ROWS_PER_BAND)
from golem_spark.streaming.dedup import DOCS_SCHEMA

PAIR_SCHEMA = "doc_a long, doc_b long"
STATE_SCHEMA = "members array<long>"


def _md5_int(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def rowwise_band_keys(text_col: str = "text"):
    """The batch MinHash band keys as per-row expressions (no explode /
    groupBy): mh_i = min over distinct tokens of the i-th affine hash."""
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))

    def _hash_fn(i, aconst):
        # factory closure: transform() inspects the lambda arity, so the
        # loop variables must not ride as default kwargs
        return lambda t: ((_md5_int(t) % MINHASH_P)
                          * F.lit(aconst % MINHASH_P)
                          + F.lit(i * 40503)) % MINHASH_P

    mhs = []
    for i, aconst in enumerate(MINHASH_A):
        mhs.append(F.array_min(F.transform(toks, _hash_fn(i, aconst))))
    return F.array(*[
        F.concat_ws("_", *[mhs[b * ROWS_PER_BAND + r].cast("string")
                           for r in range(ROWS_PER_BAND)])
        for b in range(N_BANDS)])


def _bucket_state(key, pdfs: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    new_ids: list[int] = []
    for pdf in pdfs:
        new_ids.extend(int(v) for v in pdf["doc_id"])
    new_ids = sorted(set(new_ids))
    members = sorted(state.get[0]) if state.exists else []
    seen = set(members)
    pa, pb = [], []
    for d in new_ids:
        if d in seen:
            continue
        for m in members:
            pa.append(min(d, m))
            pb.append(max(d, m))
        members.append(d)
        seen.add(d)
    state.update((members,))
    if pa:
        yield pd.DataFrame({"doc_a": pa, "doc_b": pb})


def streaming_neardup_pairs(docs: DataFrame) -> DataFrame:
    """doc stream -> LSH candidate pair rows, emitted on arrival.
    Pairs colliding in several bands emit once per band bucket —
    downstream consumers (and the batch-parity test) de-duplicate."""
    keyed = docs.select(
        "doc_id", "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        F.posexplode(rowwise_band_keys()).alias("band", "bkey"))
    return (keyed.groupBy("lang", "len_bucket", "band", "bkey")
            .applyInPandasWithState(
                _bucket_state,
                outputStructType=PAIR_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_streaming_neardup(spark: SparkSession, docs_path: str,
                          query_name: str = "stream_neardup") -> DataFrame:
    """Drive the near-dup stream over all available files (memory sink)."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = streaming_neardup_pairs(stream)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
