"""Streaming corpus curation: per-source token-budget admission.

The streaming twin of text.token_budget_pack — documents arrive as a
stream, and each source's running character total is explicit state
(applyInPandasWithState): a document is ADMITTED while the source's
exclusive prefix total is still under budget. This is the shape of an
online ingestion gate: state is O(distinct sources) (one counter each),
partitioned by the grouping key, regardless of corpus size.

Within a micro-batch documents are processed in doc_id order, so on an
in-order feed the admitted set is identical to the batch operator's —
asserted by the stream==batch test.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")
OUTPUT_SCHEMA = ("doc_id long, source string, n_chars long, "
                 "cum_before long, kept int")
STATE_SCHEMA = "cum long"


def budget_admission(docs: DataFrame, budget: int) -> DataFrame:
    """Streaming per-source admission under a character budget."""

    def admit(key, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        cum = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("doc_id")
            n = pdf["n_chars"].astype("int64")
            cum_before = cum + n.cumsum() - n
            cum = int(cum + n.sum())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "source": source,
                "n_chars": n,
                "cum_before": cum_before.astype("int64"),
                "kept": (cum_before < budget).astype("int32"),
            })
        state.update((cum,))

    return (docs.groupBy("source")
            .applyInPandasWithState(
                admit,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_budget_admission_stream(spark: SparkSession, docs_path: str,
                                budget: int,
                                query_name: str = "budget_admission"
                                ) -> DataFrame:
    """Drive the admission gate over all available documents."""
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = budget_admission(stream, budget)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_contamination_stream(spark: SparkSession, docs_path: str,
                             probe, n: int = 3, min_overlap: float = 0.3,
                             query_name: str = "contamination"):
    """Streaming benchmark decontamination: documents stream in, the
    probe (eval-suite) gram set is STATIC and broadcast — the
    stream-static join is stateless and map-side, exactly the batch
    operator's shape. The per-(doc, probe) overlap aggregation keeps
    state per flagged pair; at production scale bound it with an
    event-time watermark (docs here carry none), which is why this
    helper is a drive-everything-once gate like its batch twin.
    """
    import os

    from golem_spark.pipeline.dedup import contamination_check

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = contamination_check(stream, probe, n=n, min_overlap=min_overlap)
    q = (out.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


# -- streaming mergeable sketch: per-source KMV distinct counts -------------

KMV_OUT_SCHEMA = ("source string, n_kept long, kth_hash long, "
                  "est_distinct double, update_seq long")
KMV_STATE_SCHEMA = "hashes array<bigint>, update_seq long"

_TWO60 = float(1 << 60)


def kmv_by_group_stream(docs: DataFrame, value_col: str,
                        k: int = 32, seed: int = 0) -> DataFrame:
    """Continuously-maintained per-source KMV distinct-count sketch:
    the state is the k smallest value hashes seen so far (a mergeable
    sketch — exactly what a 100 TB ingestion dashboard keeps per
    tenant), updated per micro-batch in O(batch + k log k). Emits the
    current (n_kept, kth_hash, estimate) per source on every update;
    after all data is processed the numbers equal the batch
    kmv_distinct_by_group's.

    .. warning:: STATE SCHEMA BREAK (round 6): ``KMV_STATE_SCHEMA``
       gained ``update_seq``, so state persisted by a checkpoint from
       before that change is incompatible — restart such streams with a
       FRESH checkpoint location. The update function guards the read
       and raises a clear error instead of misreading old state."""
    import hashlib

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (source,) = key
        if state.exists:
            st = tuple(state.get)
            if len(st) != 2 or st[1] is None:
                raise ValueError(
                    "kmv_by_group_stream: persisted state lacks "
                    "update_seq (pre-round-6 checkpoint) — restart the "
                    "stream with a fresh checkpointLocation")
            cur, seq = list(st[0]), int(st[1])
        else:
            cur, seq = [], 0
        for pdf in pdfs:
            vals = pdf[value_col].astype(str)
            hs = [int(hashlib.md5(f"{v}_{seed}".encode()).hexdigest()[:15],
                      16) for v in vals]
            cur = sorted(set(cur) | set(hs))[:k]
        # monotonic per-source update counter: once a sketch is full,
        # n_kept stays k and kth_hash only shrinks, so (n_kept, kth_hash)
        # alone cannot identify the newest snapshot — the counter can.
        seq += 1
        state.update((cur, seq))
        n_kept = len(cur)
        kth = cur[-1] if cur else 0
        est = (float(n_kept) if n_kept < k
               else round((k - 1) * _TWO60 / float(kth), 6))
        yield pd.DataFrame({"source": [source], "n_kept": [n_kept],
                            "kth_hash": [kth], "est_distinct": [est],
                            "update_seq": [seq]})

    return (docs.groupBy("source")
            .applyInPandasWithState(
                update,
                outputStructType=KMV_OUT_SCHEMA,
                stateStructType=KMV_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_kmv_stream(spark: SparkSession, docs_path: str, value_col: str,
                   k: int = 32, query_name: str = "kmv_stream") -> DataFrame:
    import os

    from pyspark.sql import Window, functions as F

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = kmv_by_group_stream(stream, value_col, k=k)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    latest = spark.sql(f"SELECT * FROM {query_name}")
    w = Window.partitionBy("source").orderBy(F.col("update_seq").desc())
    return (latest.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "update_seq"))


# -- streaming DSIR quality routing -----------------------------------------


def dsir_score_stream(spark: SparkSession, docs_path: str,
                      ref_docs: DataFrame, target_source: str = "src0",
                      n_buckets: int = 64, k_smooth: float = 0.5,
                      query_name: str = "dsir_stream") -> DataFrame:
    """Streaming DSIR quality routing: the hashed-unigram log-ratio
    model is fit OFFLINE on a static reference corpus (one tiny
    collect — the <=n_buckets-entry map IS the model) and embedded as a
    literal map; the document stream is then scored by a STATELESS
    map-side projection (append mode, no state, no shuffle) — the
    production shape for routing an ingest firehose by target-likeness.
    Scoring expressions are shared with the batch operator
    (pipeline/text.py::_dsir_select), so stream==batch equality is by
    construction.
    """
    import os

    from pyspark.sql import functions as F

    from golem_spark.pipeline.text import _dsir_select, dsir_model

    model = dsir_model(ref_docs, target_source=target_source,
                       n_buckets=n_buckets, k_smooth=k_smooth).collect()[0]
    lam = model["lam_map"]
    lit_map = F.create_map(*[x for b in sorted(lam)
                             for x in (F.lit(int(b)), F.lit(int(lam[b])))])
    # smoothed empty-bucket default: a stream token hashing to a bucket
    # the reference corpus never produced scores ln((k/denom_t)/(k/denom_r)),
    # not NULL (which would silently null the whole document's score)
    lit_default = F.lit(int(model["lam_default"]))
    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    stream = reader.load(docs_path)
    out = _dsir_select(stream, lit_map, n_buckets, "text",
                       default_col=lit_default)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


# -- streaming intra-document scrub + curation-gate composition --------------


def _docs_stream(spark: SparkSession, docs_path: str):
    import os

    reader = spark.readStream.schema(DOCS_SCHEMA).format("parquet")
    if docs_path.endswith(".parquet") and os.path.isfile(docs_path):
        reader = reader.option("pathGlobFilter", os.path.basename(docs_path))
        docs_path = os.path.dirname(docs_path)
    return reader.load(docs_path)


def run_intra_doc_scrub_stream(spark: SparkSession, docs_path: str,
                               chunk: int = 8,
                               query_name: str = "intra_scrub") -> DataFrame:
    """Streaming twin of pipeline/text.intra_doc_chunk_dedup (p122):
    the scrub is pure per-row array expressions, so the stream version
    is a STATELESS append projection — no state, no shuffle, the exact
    operator an ingest pipeline runs on documents as they arrive. Same
    expressions as batch, so stream==batch equality is by construction
    (asserted by the stream-twin test)."""
    from golem_spark.pipeline.text import intra_doc_chunk_dedup

    out = intra_doc_chunk_dedup(_docs_stream(spark, docs_path), chunk=chunk)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_curation_gate_stream(spark: SparkSession, docs_path: str,
                             ref_docs: DataFrame, target_source: str = "src0",
                             n_buckets: int = 64, threshold: float = -0.5,
                             chunk: int = 8,
                             query_name: str = "curation_gate") -> DataFrame:
    """Streaming twin of the p123 curation composition's per-document
    stages: DSIR importance gate (keep logw > threshold against the
    offline-fit broadcast model) -> intra-document repetition scrub.
    Both stages are stateless per-row projections (the model is a
    literal map, the scrub pure array expressions), so the stream runs
    in append mode with zero state — the online ingest gate shape. The
    batch query's remaining stage (the shard manifest) is a bounded
    groupBy a downstream batch job runs over the admitted shards.

    Scoring shares _dsir_score_micro with the batch gate, micro-int for
    micro-int."""
    from pyspark.sql import functions as F

    from golem_spark.pipeline.text import (_dsir_score_micro, dsir_model,
                                           intra_doc_chunk_dedup)

    model = dsir_model(ref_docs, target_source=target_source,
                       n_buckets=n_buckets).collect()[0]
    lam = model["lam_map"]
    lit_map = F.create_map(*[x for b in sorted(lam)
                             for x in (F.lit(int(b)), F.lit(int(lam[b])))])
    lit_default = F.lit(int(model["lam_default"]))
    logw = F.round(
        _dsir_score_micro(lit_map, n_buckets, "text", lit_default)
        .cast("double") / 1e6, 6)
    gated = (_docs_stream(spark, docs_path)
             .withColumn("__logw", logw)
             .filter(F.col("__logw") > F.lit(float(threshold))))
    out = intra_doc_chunk_dedup(gated, chunk=chunk)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
