"""Adversarial skew-stress fixtures + measurements for the bucketed
dedup paths (VERDICT r5 item 4 / r6 item 1).

The 100 TB claim under test: the candidate-generating self-joins in
:func:`golem_spark.pipeline.dedup.minhash_lsh_pairs` and
:func:`golem_spark.pipeline.similarity.embedding_near_dup_pairs` keep
per-reducer work bounded because their shuffle keys — (lang,
len_bucket, band, bkey) and the SRP bucket id — spread even
pathological corpora, so quadratic work happens only inside buckets.

These helpers generate corpora engineered to defeat that spreading —
one dominant language (no language-block relief), a single length
bucket (no length relief), a shared boilerplate prefix in EVERY
document (a hot MinHash component), and an embedding cloud with 90% of
vectors around one direction (a hot SRP cell) — then measure the
ACTUAL bucket histogram and candidate-pair counts. The numbers turn
the "bounded buckets" claim from an assertion into a measurement: the
skew-stress pytest asserts them and tools/scale_audit.py records them
in the per-round SCALE_AUDIT artifact.

Generators are pure Spark column expressions (md5-derived determinism,
no driver-side data), so the same fixture scales to any n_docs on a
real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _md5_unit(*cols):
    """Deterministic pseudo-uniform double in [-1, 1) from md5 — the
    engine-portable noise primitive (same trick as dedup._md5_int)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("_", *cols)), 1, 15), 16, 10) \
        .cast("double")
    return h / F.lit(float(1 << 60)) * F.lit(2.0) - F.lit(1.0)


def adversarial_documents(spark: SparkSession, n_docs: int = 4000,
                          n_boiler: int = 6, n_unique: int = 10,
                          hot_lang_pct: int = 95, seed: int = 7) -> DataFrame:
    """A corpus built to concentrate LSH buckets: ``hot_lang_pct``% of
    documents share one language, every document is the same length
    (one len_bucket), and every document starts with the same
    ``n_boiler`` boilerplate tokens (>=100x hotter than any organic
    token), followed by ``n_unique`` deterministic unique tokens.

    Columns match the documents table contract used by the dedup stack:
    (doc_id, text, lang, source, n_chars)."""
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    boiler = " ".join(f"boilerplate{j}" for j in range(n_boiler))
    idc = F.col("doc_id").cast("string")
    uniq = F.concat_ws(" ", *[
        F.concat(F.lit("u"), F.substring(
            F.md5(F.concat_ws("_", idc, F.lit(str(j)), F.lit(str(seed)))),
            1, 10))
        for j in range(n_unique)])
    text = F.concat_ws(" ", F.lit(boiler), uniq)
    lang = (F.when(F.pmod(F.col("doc_id"), 100) < hot_lang_pct, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), F.pmod(F.col("doc_id"), 4))))
    return ids.select(
        "doc_id", text.alias("text"), lang.alias("lang"),
        F.lit("adversarial").alias("source"),
        F.length(text).alias("n_chars"))


def adversarial_embeddings(spark: SparkSession, n_vecs: int = 4000,
                           dim: int = 16, hot_pct: int = 90,
                           noise: float = 0.35, seed: int = 11) -> DataFrame:
    """An embedding cloud built to concentrate SRP buckets: ``hot_pct``%
    of vectors are one shared direction plus bounded noise (correlated
    but mostly below the 0.95 near-dup threshold), the rest pure noise.
    Columns match the embeddings table contract (vec_id, embedding)."""
    ids = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    idc = F.col("vec_id").cast("string")
    hot = (F.pmod(F.col("vec_id"), 100) < hot_pct).cast("double")
    emb = F.array(*[
        (hot + F.lit(noise)
         * _md5_unit(idc, F.lit(str(j)), F.lit(str(seed)))).cast("float")
        for j in range(dim)])
    return ids.select("vec_id", emb.alias("embedding"))


def adversarial_cell_embeddings(spark: SparkSession, n_vecs: int = 4000,
                                dim: int = 16, n_seeds: int = 16,
                                hot_pct: int = 80, noise: float = 0.35,
                                seed: int = 13) -> DataFrame:
    """An embedding cloud built to concentrate IVF cells under FIRST-N
    seeding (the cross-engine oracle fixture for semantic_dedup /
    hard_negatives): seed vector 0 IS the shared hot direction, seeds
    1..n_seeds-1 are near-orthogonal basis directions, and ``hot_pct``%
    of the remaining corpus sits around the hot direction — every hot
    vector's nearest seed is seed 0, so the whole cluster lands in ONE
    cell (the worst case the paper-recommended n_seeds-grows-with-n
    sizing exists to prevent). Learned k-means seeds
    (kmeans_seed_centroids) must split that cluster; the skew test
    asserts both sides.
    Columns match the embeddings table contract (vec_id, embedding)."""
    ids = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    idc = F.col("vec_id").cast("string")
    is_basis_seed = (F.col("vec_id") >= 1) & (F.col("vec_id") < n_seeds)
    hot = (F.pmod(F.col("vec_id"), 100) < hot_pct).cast("double")
    emb = F.array(*[
        F.when(is_basis_seed,
               # distinct basis direction e_{id mod dim} + tiny jitter
               (F.col("vec_id") % dim == j).cast("double")
               + F.lit(0.05) * _md5_unit(idc, F.lit(str(j)),
                                         F.lit(str(seed))))
        # vec 0: the pure hot direction (becomes seed 0); others:
        # hot-cluster members or pure noise
        .otherwise(F.when(F.col("vec_id") == 0, F.lit(1.0))
                   .otherwise(hot) + F.lit(noise)
                   * _md5_unit(idc, F.lit(str(j)), F.lit(str(seed))))
        .cast("float")
        for j in range(dim)])
    return ids.select("vec_id", emb.alias("embedding"))


def ivf_cell_stats(vecs: DataFrame, n_seeds="auto",
                   seed_centroids=None) -> dict:
    """Measured skew profile of the IVF cell routing that bounds the
    quadratic pair pass in semantic_dedup (p116) and hard_negatives
    (p117): the cell histogram IS the per-reducer bound — cell_pairs is
    exactly the candidate-join work, max_cell_fraction the hottest
    reducer's share of the corpus. ``n_seeds`` follows the library
    default ('auto' = corpus-scaled via auto_n_seeds) so the recorded
    profile reflects what a caller gets WITHOUT tuning the knob."""
    from golem_spark.pipeline.similarity import (_resolve_n_seeds,
                                                 _with_cells)

    n_vecs = vecs.count()
    if seed_centroids is None:
        n_seeds = _resolve_n_seeds(vecs, n_seeds)
    else:
        n_seeds = len(seed_centroids)
    cells = _with_cells(vecs, n_seeds, "embedding", "vec_id",
                        seed_centroids)
    prof = (cells.groupBy("cell").agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.max("sz").alias("max_cell"),
                 F.sum(F.when(F.col("sz") > 1,
                              F.col("sz") * (F.col("sz") - 1) / 2)
                       .otherwise(F.lit(0))).cast("long")
                 .alias("cell_pairs")).collect()[0])
    quad = n_vecs * (n_vecs - 1) // 2
    return {
        "n_vecs": n_vecs,
        "n_seeds": n_seeds,
        "learned_seeds": seed_centroids is not None,
        "n_cells": int(prof["n_cells"]),
        "max_cell": int(prof["max_cell"]),
        "cell_pairs": int(prof["cell_pairs"]),
        "quadratic_pairs": int(quad),
        "pair_fraction": round(prof["cell_pairs"] / max(quad, 1), 6),
        "max_cell_fraction": round(prof["max_cell"] / max(n_vecs, 1), 6),
    }


def two_level_subcell_stats(vecs: DataFrame, n_seeds: int = 16,
                            sub_k: int = 8, threshold: float = 0.95,
                            learned: bool = False) -> dict:
    """Measured (cell, subcell) skew profile of semantic_dedup_two_level
    (p124): group_pairs IS the two-level quadratic pair budget,
    max_group the hottest reducer's share. Run once with the first-n
    sub-seed convention (the oracle fixture) and once with
    ``learned=True`` (per-cell mini-Lloyd) so the SCALE_AUDIT artifact
    records the level-2 analogue of the first-n-vs-learned level-1
    comparison (VERDICT r10 item 5)."""
    from golem_spark.pipeline.similarity import semantic_dedup_two_level

    n_vecs = vecs.count()
    out = semantic_dedup_two_level(vecs, n_seeds=n_seeds, sub_k=sub_k,
                                   threshold=threshold,
                                   learned_sub_seeds=learned)
    prof = (out.groupBy("cell", "subcell").agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.max("sz").alias("max_group"),
                 F.sum(F.when(F.col("sz") > 1,
                              F.col("sz") * (F.col("sz") - 1) / 2)
                       .otherwise(F.lit(0))).cast("long")
                 .alias("group_pairs")).collect()[0])
    quad = n_vecs * (n_vecs - 1) // 2
    return {
        "n_vecs": n_vecs,
        "n_seeds": n_seeds,
        "sub_k": sub_k,
        "learned_sub_seeds": learned,
        "n_groups": int(prof["n_groups"]),
        "max_group": int(prof["max_group"]),
        "group_pairs": int(prof["group_pairs"]),
        "quadratic_pairs": int(quad),
        "pair_fraction": round(prof["group_pairs"] / max(quad, 1), 6),
        "max_group_fraction": round(prof["max_group"] / max(n_vecs, 1), 6),
    }


def lsh_bucket_stats(docs: DataFrame) -> dict:
    """Measured skew profile of the MinHash-LSH candidate join on
    ``docs``: the (lang, len_bucket, band, bkey) bucket histogram that
    IS the per-reducer bound, the candidate-pair count the buckets
    emit, and the block-quadratic worst case they are measured against
    (what a blocking-only join without band keys would pay)."""
    from golem_spark.pipeline.dedup import (_block_key, band_buckets,
                                            minhash_lsh_pairs)

    n_docs = docs.count()
    buckets = (band_buckets(docs)
               .groupBy("lang", "len_bucket", "band", "bkey")
               .agg(F.count(F.lit(1)).alias("sz")))
    prof = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.when(F.col("sz") > 1, F.col("sz") * (F.col("sz") - 1) / 2)
              .otherwise(F.lit(0))).cast("long").alias("bucket_pairs"),
    ).collect()[0]
    block_quad = (docs.select(*_block_key())
                  .groupBy("lang", "len_bucket")
                  .agg(F.count(F.lit(1)).alias("n"))
                  .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)
                       .cast("long").alias("q")).collect()[0]["q"])
    cand = minhash_lsh_pairs(docs).count()
    return {
        "n_docs": n_docs,
        "n_buckets": int(prof["n_buckets"]),
        "max_bucket": int(prof["max_bucket"]),
        "bucket_pairs": int(prof["bucket_pairs"]),
        "candidate_pairs": int(cand),
        "block_quadratic_pairs": int(block_quad),
        "pair_fraction": round(prof["bucket_pairs"] / max(block_quad, 1), 6),
        "max_bucket_fraction": round(prof["max_bucket"] / max(n_docs, 1), 6),
    }


def embedding_bucket_stats(vecs: DataFrame, n_planes: int = 10,
                           threshold: float = 0.95) -> dict:
    """Measured skew profile of the SRP-bucketed embedding near-dup
    join: bucket histogram, within-bucket pair count (the join's real
    work), and surviving near-dup pairs."""
    from golem_spark.pipeline.similarity import (_with_sig_norm,
                                                 embedding_near_dup_pairs)

    n_vecs = vecs.count()
    sig = _with_sig_norm(vecs, "embedding", "vec_id", n_planes)
    prof = (sig.groupBy("bucket").agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.max("sz").alias("max_bucket"),
                 F.sum(F.when(F.col("sz") > 1,
                              F.col("sz") * (F.col("sz") - 1) / 2)
                       .otherwise(F.lit(0))).cast("long")
                 .alias("bucket_pairs")).collect()[0])
    survivors = embedding_near_dup_pairs(
        vecs, threshold=threshold, n_planes=n_planes).count()
    quad = n_vecs * (n_vecs - 1) // 2
    return {
        "n_vecs": n_vecs,
        "n_planes": n_planes,
        "n_buckets": int(prof["n_buckets"]),
        "max_bucket": int(prof["max_bucket"]),
        "bucket_pairs": int(prof["bucket_pairs"]),
        "near_dup_pairs": int(survivors),
        "quadratic_pairs": int(quad),
        "pair_fraction": round(prof["bucket_pairs"] / max(quad, 1), 6),
        "max_bucket_fraction": round(prof["max_bucket"] / max(n_vecs, 1), 6),
    }


# ~60 highest-frequency English words (public knowledge) — the head of
# the Zipf curve, so early BPE merges see real English adjacencies
# (th/he/an/in/er/re...) instead of the synthetic corpus's 31 words
_ZIPF_HEAD = (
    "the of and to in is that it was for on are as with his they at be "
    "this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up "
    "other about out many then them these so some her would make like "
    "him into time has look two more write go see").split()

_SYL_ONSET = ["", "b", "c", "d", "f", "g", "h", "l", "m", "n", "p", "r",
              "s", "t", "v", "w", "st", "th", "ch", "sh", "pr", "tr",
              "br", "gr", "pl", "cl", "sp", "str"]
_SYL_VOWEL = ["a", "e", "i", "o", "u", "ea", "ou", "ai", "ee", "io", "oo"]
_SYL_CODA = ["", "n", "r", "s", "t", "l", "d", "m", "k", "ng", "st",
             "nd", "nt", "ck"]
_SUFFIX = ["", "", "", "", "s", "ed", "ing", "er", "ly", "tion"]


def zipfian_vocabulary(vocab_size: int = 20000,
                       seed: int = 11) -> "list[tuple[str, float]]":
    """(word, probability) list: real-English head + syllable-morphology
    tail (onset-vowel-coda syllables and common suffixes, so character
    adjacency statistics resemble natural text), with Zipf-Mandelbrot
    frequencies f(r) ~ 1/(r + 2.7)^1.05 — the distribution BPE
    tokenizer training actually sees, vs the synthetic documents
    table's 31 near-uniform words (VERDICT r9 item 2)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    words: list[str] = []
    seen = set()
    for w in _ZIPF_HEAD:
        if w not in seen:
            seen.add(w)
            words.append(w)
    while len(words) < vocab_size:
        n_syl = int(rng.integers(1, 4))
        w = "".join(
            _SYL_ONSET[int(rng.integers(len(_SYL_ONSET)))]
            + _SYL_VOWEL[int(rng.integers(len(_SYL_VOWEL)))]
            + _SYL_CODA[int(rng.integers(len(_SYL_CODA)))]
            for _ in range(n_syl)) + _SUFFIX[int(rng.integers(len(_SUFFIX)))]
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    ranks = np.arange(1, len(words) + 1, dtype=np.float64)
    wts = 1.0 / np.power(ranks + 2.7, 1.05)
    wts /= wts.sum()
    return list(zip(words, wts.tolist()))


def zipfian_documents(spark: SparkSession, n_docs: int = 20000,
                      words_per_doc: int = 100, vocab_size: int = 20000,
                      seed: int = 11) -> DataFrame:
    """Natural-text-shaped corpus: every token drawn iid from the
    Zipf-Mandelbrot vocabulary via a 16-bit inverse-CDF lookup table.

    Scale shape: the LUT (65536 rows) is built driver-side from the
    model-sized vocabulary and BROADCAST; each token slot derives a
    deterministic md5 uniform, quantizes it, and equi-joins the LUT —
    no range join, no driver-side corpus. Document assembly is one
    groupBy(doc_id) over the token table. Columns match the documents
    table contract (doc_id, text, lang, source, n_chars)."""
    import numpy as np
    import pandas as pd

    vocab = zipfian_vocabulary(vocab_size, seed)
    cum = np.cumsum([p for _, p in vocab])
    buckets = np.searchsorted(cum, (np.arange(65536) + 0.5) / 65536.0)
    buckets = np.minimum(buckets, len(vocab) - 1)
    lut = spark.createDataFrame(
        pd.DataFrame({"bucket": np.arange(65536, dtype=np.int64),
                      "word": [vocab[i][0] for i in buckets]}))

    toks = (spark.range(n_docs * words_per_doc)
            .select((F.col("id") / words_per_doc).cast("long")
                    .alias("doc_id"),
                    F.pmod(F.col("id"), F.lit(words_per_doc)).alias("pos"),
                    F.pmod(F.conv(F.substring(
                        F.md5(F.concat_ws("_", F.col("id").cast("string"),
                                          F.lit(str(seed)))), 1, 15),
                        16, 10).cast("long"), F.lit(65536)).alias("bucket")))
    docs = (toks.join(F.broadcast(lut), "bucket")
            .groupBy("doc_id")
            .agg(F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"]), " ").alias("text")))
    return docs.select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("zipf_fixture").alias("source"),
        F.length("text").alias("n_chars"))
