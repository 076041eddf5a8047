"""Streaming corpus monitors: incremental twins of the batch quantile
and drift diagnostics (p93_sampled_quantiles, p96_source_kl_drift).

Both follow the foreachBatch ACCUMULATOR-SINK shape — the scalable
pattern for monotonically-growing monitoring state that is too large
for executor-memory state stores (a web-scale vocabulary, a 0.1%
sample of 100 TB):

- each micro-batch reduces ITSELF (combinable: a deterministic
  hash-sample filter, a token-count groupBy) and writes the reduced
  partial to a ``batch=<id>`` partition of a parquet store — per-batch
  work is batch-sized, appended state is sample-/vocab-sized, never
  corpus-sized. Keying the write on foreachBatch's batch_id makes the
  sink IDEMPOTENT: foreachBatch is at-least-once, so a micro-batch
  replayed after failure/checkpoint recovery simply overwrites its own
  partition instead of double-counting tokens / duplicating sample
  rows — the exact stream==batch equality survives replays;
- the current monitor value is computed on demand by folding the store
  (a groupBy-sum over partial counts, a quantile over the sample) with
  the SAME functions the batch queries use, so stream==batch equality
  holds exactly: the md5 hash-sample is deterministic per key (not
  df.sample), and token counts are additive across any batch split.

On a production cluster the parquet store would be a table with
compaction; the fold cost is bounded by store size, not stream history,
because each append is already reduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

from golem_spark.operators.relational import group_quantiles, hash_sample
from golem_spark.pipeline.text import tokens_col, unigram_kl_from_counts


def _batch_dir(store_dir: str, batch_id: int) -> str:
    """Partition path for one micro-batch: overwriting it (instead of
    appending to the store root) is what makes replays idempotent."""
    return os.path.join(store_dir, f"batch={int(batch_id)}")


def sampled_quantiles_sink(store_dir: str, key_col: str = "l_orderkey",
                           rate: float = 0.1, seed: int = 3):
    """foreachBatch sink: write each micro-batch's deterministic
    md5-hash sample (same predicate as relational.hash_sample, so the
    retained KEYS are identical however the stream is micro-batched)
    to the batch's own ``batch=<id>`` partition of ``store_dir`` —
    a replayed batch overwrites itself, never duplicates."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (hash_sample(batch_df, key_col, rate, seed=seed)
         .write.mode("overwrite").parquet(_batch_dir(store_dir, batch_id)))

    return sink


def sampled_quantiles_result(spark: SparkSession, store_dir: str,
                             group_col: str, value_col: str,
                             qs=(0.5, 0.9)) -> DataFrame:
    """Current per-group quantiles over the accumulated sample store —
    the identical group_quantiles the batch query (p93) runs on its
    sample side. Partition discovery adds the ``batch`` column; it is
    ignored by the fold."""
    return group_quantiles(spark.read.parquet(store_dir),
                           group_col, value_col, list(qs))


def kl_drift_sink(store_dir: str, source_a: str, source_b: str,
                  text_col: str = "text"):
    """foreachBatch sink: reduce each micro-batch to (source, tok, cnt)
    partial token counts for the two monitored sources and write them
    to the batch's own ``batch=<id>`` partition (idempotent replays).
    Counts are additive, so the folded store equals the batch counts
    over the union of all micro-batches regardless of batching."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df
         .filter(F.col("source").isin([source_a, source_b]))
         .select("source", F.explode(tokens_col(text_col)).alias("tok"))
         .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
         .write.mode("overwrite").parquet(_batch_dir(store_dir, batch_id)))

    return sink


def kl_drift_result(spark: SparkSession, store_dir: str,
                    source_a: str, source_b: str,
                    k_smooth: float = 0.5) -> DataFrame:
    """Current symmetric-KL drift from the accumulated partial counts —
    folds the store with a combinable groupBy-sum, then runs the SAME
    unigram_kl_from_counts expressions as the batch query (p96)."""
    merged = (spark.read.parquet(store_dir)
              .groupBy("source", "tok")
              .agg(F.sum("cnt").alias("cnt")))
    return unigram_kl_from_counts(merged, source_a, source_b,
                                  k_smooth=k_smooth)


def cdc_dedup_sink(store_dir: str, divisor: int = 8,
                   text_col: str = "text"):
    """foreachBatch sink: reduce each micro-batch of documents to its
    CDC chunk fingerprints (doc-LOCAL — every fingerprint row derives
    from one document, so per-batch computation is exact) and write
    them to the batch's own ``batch=<id>`` partition (idempotent
    replays). The accumulated store is per-chunk mergeable state: three
    longs per chunk, never chunk text."""
    from golem_spark.pipeline.dedup import cdc_chunk_fingerprints

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (cdc_chunk_fingerprints(batch_df, divisor, text_col)
         .write.mode("overwrite").parquet(_batch_dir(store_dir, batch_id)))

    return sink


def cdc_dedup_result(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current cross-document CDC dedup signal over the accumulated
    fingerprint store — the SAME cdc_dup_from_chunks fold the batch
    query (p83) runs, so stream==batch equality holds exactly (chunking
    is per-document; the fold's groupBys are combinable)."""
    from golem_spark.pipeline.dedup import cdc_dup_from_chunks

    return cdc_dup_from_chunks(spark.read.parquet(store_dir))


def expectation_sink(store_dir: str, rules):
    """foreachBatch sink for continuous data-quality monitoring: reduce
    each micro-batch to its per-rule (n_rows, n_violations) partial —
    conditional sums, combinable across any batch split — and write it
    to the batch's own ``batch=<id>`` partition (idempotent replays).
    The 100 TB shape: per-batch work is one scan of the batch, appended
    state is |rules| rows per batch."""
    from golem_spark.operators.profiling import expectation_report

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (expectation_report(batch_df, rules)
         .select("rule_idx", "rule", "n_rows", "n_violations")
         .write.mode("overwrite").parquet(_batch_dir(store_dir, batch_id)))

    return sink


def expectation_result(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current global expectation report from the accumulated partials:
    integer sums fold exactly, then the SAME rate/passed derivation as
    the batch expectation_report — stream==batch equality is exact."""
    return (spark.read.parquet(store_dir)
            .groupBy("rule_idx", "rule")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("n_violations").alias("n_violations"))
            .select("rule_idx", "rule", "n_rows", "n_violations",
                    F.round(F.col("n_violations")
                            / F.greatest(F.col("n_rows"), F.lit(1)), 6)
                    .alias("violation_rate"),
                    (F.col("n_violations") == 0).alias("passed")))
