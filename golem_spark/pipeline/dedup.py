"""Deduplication operators over the documents table.

Four strategies, all deterministic and shuffle-conscious:

- exact: md5 content hash -> groupBy (one shuffle on the hash; at scale
  this is the classic map-side-combinable exact dedup).
- n-gram Jaccard: EXACT set-similarity join via frequency-ordered
  prefix filtering (AllPairs/PPJoin) — candidates keyed on (prefix
  token, lang, length-bucket), verified with the exact Jaccard, so no
  unbounded all-pairs self-join survives in the plan.
- MinHash + LSH: k=8 deterministic min-hashes over distinct tokens,
  banded 4x2 in ONE posexplode pass; candidate pairs = same (band,
  band-hash) bucket — the standard sub-quadratic near-dup path for
  100 TB corpora.
- SimHash: 16-bit sign-sum fingerprint; near-dups = hamming <= 2 via
  exact pigeonhole chunk indexing + verification.

Hashing is md5-based so Spark and DuckDB agree bit-for-bit (see
pipeline/kernels.py for the oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from golem_spark.pipeline.text import tokens_col

# deterministic affine min-hash constants (fixed, shared with the oracle)
MINHASH_A = [2654435761, 2246822519, 3266489917, 668265263,
             374761393, 3141592653, 40503, 2166136261]
MINHASH_P = 2147483647
N_BANDS = 4
ROWS_PER_BAND = 2


def _md5_int(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _block_key():
    return [F.col("lang"), (F.col("n_chars") / 100).cast("long").alias("len_bucket")]


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, min_doc_id)."""
    return (df.select(F.md5(F.col(text_col)).alias("text_hash"), "doc_id")
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_doc_id"))
            .filter(F.col("n_dups") > 1))


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5,
                        text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within (lang,
    length-bucket) blocks. Output (doc_a, doc_b, jaccard).

    EXACT sub-quadratic set-similarity join via prefix filtering
    (AllPairs / PPJoin, Bayardo et al. WWW'07): order every document's
    tokens by ascending corpus frequency and keep only the first
    |A| - ceil(t*|A|) + 1 of them; any pair with Jaccard >= t MUST share
    a prefix token, so the candidate join is keyed on (prefix token,
    block) instead of block alone — no unbounded all-pairs self-join,
    and rare tokens (the frequency-ascending prefix heads) bound bucket
    sizes at 100 TB. Candidates are then verified with the exact
    Jaccard expression, so results equal the brute-force definition and
    the DuckDB oracle is unchanged.

    The size prefilter is derived from the threshold (J >= t implies
    t*|B| <= |A| <= |B|/t), sound for ANY t in (0, 1]."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    from pyspark.sql import Window

    from golem_spark.pipeline._cache import _swap_cache

    # tokenize ONCE: the slim (doc_id, tok) frame feeds the frequency
    # aggregation, the ranked prefix, AND the verification sets below.
    # Without the persist the corpus is re-tokenized+exploded ~4x in one
    # lineage (measured 3.6x wall-clock at sf0.1) — pure waste at scale.
    toks_arr = F.array_distinct(tokens_col(text_col))
    toks = _swap_cache(
        "jaccard_toks", df.select("doc_id", F.explode(toks_arr).alias("tok")))
    tok_freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_freq"))

    # slim (doc_id, tok) rows through the frequency join + windows; the
    # block keys join back afterwards (measured faster than carrying
    # wide rows through the window sort)
    w_doc = Window.partitionBy("doc_id").orderBy("tok_freq", "tok")
    w_cnt = Window.partitionBy("doc_id")
    ranked = (toks.join(tok_freq, "tok")
              .withColumn("rn", F.row_number().over(w_doc))
              .withColumn("n_toks", F.count(F.lit(1)).over(w_cnt)))
    prefix_len = (F.col("n_toks")
                  - F.ceil(F.lit(float(threshold)) * F.col("n_toks")) + 1)
    # the prefix frame is the self-joined candidate source (read twice);
    # persist it so the freq-join + double window run once, not twice
    prefix = _swap_cache("jaccard_prefix", (
        ranked.filter(F.col("rn") <= prefix_len)
        .select("doc_id", "tok", "n_toks")
        .join(df.select("doc_id", *_block_key()), "doc_id")))

    a = prefix.alias("a")
    b = prefix.alias("b")
    t_lit = F.lit(float(threshold))
    # candidates are read three times below (two doc-id projections +
    # the verify join): persist — the prefix filter bounds their count,
    # so the cached frame is small by construction
    cand = _swap_cache("jaccard_cand", (
        a.join(b, on=[F.col("a.tok") == F.col("b.tok"),
                      F.col("a.lang") == F.col("b.lang"),
                      F.col("a.len_bucket") == F.col("b.len_bucket"),
                      F.col("a.doc_id") < F.col("b.doc_id"),
                      F.col("a.n_toks") >= t_lit * F.col("b.n_toks"),
                      F.col("b.n_toks") >= t_lit * F.col("a.n_toks")])
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()))

    # verify candidates with the exact Jaccard. Token sets come from
    # re-tokenizing ONLY the documents that appear in a candidate pair
    # (a semi-join on the candidate doc ids): the prefix filter bounds
    # candidates far below the corpus, so this map-only re-tokenize of
    # the survivors is much cheaper than shuffling the full exploded
    # token frame through a groupBy/collect_set — the distinction that
    # matters at 100 TB, where the exploded frame is the largest
    # intermediate in the query.
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .union(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    # persisted: the frame feeds BOTH sides of the verify join below —
    # without the persist the candidate join + tokenize runs twice
    sets = _swap_cache("jaccard_sets", (
        df.join(cand_docs, "doc_id")
        .select("doc_id", toks_arr.alias("toks"))))
    jac = (F.size(F.array_intersect(F.col("sa.toks"), F.col("sb.toks"))).cast("double")
           / F.size(F.array_union(F.col("sa.toks"), F.col("sb.toks"))).cast("double"))
    return (cand.join(sets.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(sets.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")))


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """k=8 min-hash signature columns mh0..mh7 over distinct tokens."""
    toks = F.array_distinct(tokens_col(text_col))
    base = df.select("doc_id", F.explode(toks).alias("tok"))
    h = _md5_int(F.col("tok")) % F.lit(MINHASH_P)
    aggs = []
    for i, aconst in enumerate(MINHASH_A):
        hi = (h * F.lit(aconst % MINHASH_P) + F.lit(i * 40503)) % F.lit(MINHASH_P)
        aggs.append(F.min(hi).alias(f"mh{i}"))
    return base.groupBy("doc_id").agg(*aggs)


def band_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The (doc_id, lang, len_bucket, band, bkey) bucket-membership frame
    minhash_lsh_pairs self-joins on — exposed so the skew-stress test can
    measure actual bucket sizes on an adversarial corpus (the shuffle-key
    distribution IS the per-reducer bound at scale)."""
    sig = minhash_signatures(df, text_col).join(
        df.select("doc_id", *_block_key()), "doc_id")
    # ONE pass: emit all band keys as an array and posexplode — the
    # signature aggregation is computed once, not once per band (the
    # per-band select + union form re-ran the whole explode+groupBy
    # N_BANDS times)
    band_arr = F.array(*[
        F.concat_ws("_", *[F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                           for r in range(ROWS_PER_BAND)])
        for b in range(N_BANDS)])
    return sig.select("doc_id", "lang", "len_bucket",
                      F.posexplode(band_arr).alias("band", "bkey"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidate pairs: band signatures (4 bands x 2 rows) blocked by
    (lang, length-bucket); documents sharing any band bucket within a
    block become a candidate pair. Output (doc_a, doc_b, n_shared_bands).

    Blocking bounds bucket skew: the shuffle key is (block, band, bkey),
    so a pathologically common signature cannot concentrate a corpus-
    sized bucket on one reducer."""
    allb = band_buckets(df, text_col)
    a = allb.alias("a")
    b2 = allb.alias("b")
    return (a.join(b2, on=[F.col("a.lang") == F.col("b.lang"),
                           F.col("a.len_bucket") == F.col("b.len_bucket"),
                           F.col("a.band") == F.col("b.band"),
                           F.col("a.bkey") == F.col("b.bkey"),
                           F.col("a.doc_id") < F.col("b.doc_id")])
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_shared_bands")))


def simhash(df: DataFrame, n_bits: int = 16, text_col: str = "text") -> DataFrame:
    """16-bit SimHash fingerprint: bit j set when
    sum over distinct tokens of (bit j of md5int(token) ? +1 : -1) > 0."""
    toks = F.array_distinct(tokens_col(text_col))
    base = df.select("doc_id", F.explode(toks).alias("tok"))
    h = _md5_int(F.col("tok"))
    fp = F.lit(0).cast("long")
    bit_aggs = []
    for j in range(n_bits):
        bit = F.shiftright(h, j) % 2
        bit_aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{j}"))
    agg = base.groupBy("doc_id").agg(*bit_aggs)
    for j in range(n_bits):
        fp = fp + F.when(F.col(f"b{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 2, n_bits: int = 16,
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming within (lang,
    length-bucket) blocks. Output (doc_a, doc_b, hamming).

    EXACT multi-index hamming search: the fingerprint is split into
    max_hamming + 1 contiguous chunks; by pigeonhole any pair within
    hamming distance max_hamming matches on at least one chunk, so the
    candidate join is keyed on (chunk_id, chunk_value, block) — bounded
    buckets instead of an unbounded per-block all-pairs join — and the
    exact hamming filter then verifies candidates. Identical results to
    the brute-force definition."""
    sh = simhash(df, n_bits=n_bits, text_col=text_col)
    meta = df.select("doc_id", *_block_key())
    full = sh.join(meta, "doc_id")

    n_chunks = max_hamming + 1
    widths = [n_bits // n_chunks + (1 if i < n_bits % n_chunks else 0)
              for i in range(n_chunks)]
    chunk_exprs = []
    start = 0
    for w in widths:
        chunk_exprs.append(
            (F.shiftright(F.col("simhash"), start) % F.lit(1 << w)).cast("long"))
        start += w
    ex = full.select("doc_id", "simhash", "lang", "len_bucket",
                     F.posexplode(F.array(*chunk_exprs)).alias("chunk", "cval"))
    a = ex.alias("a")
    b = ex.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, on=[F.col("a.chunk") == F.col("b.chunk"),
                          F.col("a.cval") == F.col("b.cval"),
                          F.col("a.lang") == F.col("b.lang"),
                          F.col("a.len_bucket") == F.col("b.len_bucket"),
                          F.col("a.doc_id") < F.col("b.doc_id")])
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def dup_components(pairs: DataFrame, a_col: str = "doc_a",
                   b_col: str = "doc_b", max_iter: int = 25,
                   driver_max_edges: int = 5_000_000,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components over near-duplicate PAIRS: (doc_id, rep)
    where rep is the smallest doc_id in the document's component — the
    canonical representative a dedup pipeline keeps.

    Two phases, chosen by edge count (the adaptive endgame GraphX /
    GraphFrames use): candidate PAIRS are a tiny fraction of the corpus
    by construction — LSH emits only bucket-collisions — so even on a
    100 TB corpus the edge frame usually fits on the driver. When it
    does (<= ``driver_max_edges``, ~16 B/edge -> default caps the
    collect at ~100 MB), one collect + path-compressed union-find beats
    dozens of distributed jobs whose inputs are kilobytes. Larger edge
    sets take the distributed path:

    iterative min-label propagation WITH pointer jumping: every round a
    node adopts the minimum of (its label, its neighbors' labels, its
    label's label). The neighbor term is one join + one groupBy (two
    shuffles) over the EDGE frame only — never an all-pairs product —
    and the pointer-jump term is a self-join of the tiny label frame,
    which halves the remaining path to the component minimum each
    round: O(log diameter) rounds instead of O(diameter), the bound
    that matters for the chain-shaped components transitive LSH
    matching produces. Labels are monotone non-increasing, so
    convergence is a single sum aggregate (no extra join).

    Raises if max_iter rounds don't converge (honest failure beats a
    silently wrong partition).

    ``checkpoint_dir``: per-round label snapshots default to
    localCheckpoint (executor block manager — fast, but an executor
    loss mid-computation kills the lineage-truncated frame and the
    job). On a real cluster pass a durable directory (HDFS/S3): rounds
    then use reliable checkpoint(), which survives executor churn at
    the cost of one distributed write per round. Same labels either
    way (asserted in tests). Hygiene (VERDICT r9 item 7 / ADVICE r9):
    each call checkpoints into its own fresh ``<dir>/<uuid>`` subdir
    (Spark's setCheckpointDir contract); once round k's snapshot is
    materialized, round k-2's files are deleted (only labels k and
    k-1 are reachable), the fixed point keeps a single snapshot, and
    a LATER dup_components call deletes the whole previous subdir
    once the previously RETURNED frame is no longer referenced by the
    caller (weakref-gated, ContextCleaner-style — holding an earlier
    result across later calls is supported; its snapshot is simply
    deferred, never deleted out from under it). So on-disk state is
    one live snapshot per still-referenced result, not one directory
    per round per call.

    Concurrency (ADVICE r10): setCheckpointDir is SparkContext-GLOBAL,
    so reliable-checkpoint runs are SERIALIZED on a module lock —
    concurrent ``dup_components(checkpoint_dir=...)`` calls queue
    rather than redirect each other's round snapshots into a subdir
    the other call's pruner owns. localCheckpoint runs (no
    ``checkpoint_dir``) touch no global state and stay concurrent.
    The context's prior checkpoint dir is restored before returning —
    the USER-FACING directory (resolved ``<dir>/<uuid>`` child
    stripped), so repeated calls don't nest later checkpoint() callers
    ever deeper. Unrelated checkpoint() callers in OTHER threads
    during the loop still see this call's dir — point them at their
    own.
    """
    from golem_spark.pipeline._cache import _swap_cache

    pairs = _swap_cache("cc_pairs", pairs.select(a_col, b_col))
    if pairs.count() <= driver_max_edges:
        return _dup_components_driver(pairs, a_col, b_col)
    sc = pairs.sparkSession.sparkContext
    prev_ckpt = resolved_ckpt = None
    if checkpoint_dir is not None:
        # serialize: a concurrent reliable-checkpoint call would
        # redirect this call's later round snapshots into ITS private
        # subdir, where its keep=2 prune can delete a still-referenced
        # label snapshot mid-loop (ADVICE r10).
        _CC_CKPT_LOCK.acquire()
        try:
            opt = sc._jsc.sc().getCheckpointDir()
            prev_ckpt = opt.get() if opt.isDefined() else None
            sc.setCheckpointDir(checkpoint_dir)
            resolved_ckpt = sc._jsc.sc().getCheckpointDir().get()
        except BaseException:
            _CC_CKPT_LOCK.release()
            raise

    def _snap(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        out = df.checkpoint(eager=True)
        # round k is on disk -> k-2 and older are unreachable
        _prune_reliable_checkpoints(sc, resolved_ckpt, keep=2)
        return out
    edges = (pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
             .union(pairs.select(F.col(b_col).alias("x"),
                                 F.col(a_col).alias("y")))
             .distinct())
    edges = _swap_cache("cc_edges", edges)
    # localCheckpoint (eager) rather than persist: each round's plan
    # references the previous labels frame THREE times (self, neighbor
    # join, pointer jump), so without lineage TRUNCATION the logical
    # plan grows 3^round and Catalyst analysis, not the data, becomes
    # the bottleneck. On a cluster with executor churn, substitute
    # reliable checkpoint(dir) — same shape, durable storage.
    # Checkpoint blocks are freed by Spark's ContextCleaner once the
    # DataFrame is unreferenced (there is no public eager-release API
    # for localCheckpoint storage): each round drops its reference to
    # the predecessor immediately, and the surviving fixed point is
    # parked in _CC_FINAL so the NEXT call drops it — so only O(1)
    # label snapshots are ever reachable, and the cleaner reclaims the
    # rest between jobs (asserted growth-bounded in
    # test_pipeline_cache_growth_is_bounded).
    finished = False
    try:
        labels = _snap(edges.select("x").distinct()
                       .select("x", F.col("x").alias("lbl")))
        prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        converged = False
        for _ in range(max_iter):
            nb_min = (edges.join(labels.select(F.col("x").alias("y"),
                                               F.col("lbl").alias("nlbl")),
                                 "y")
                      .groupBy("x").agg(F.min("nlbl").alias("nb")))
            jump = (labels.select("x", F.col("lbl").alias("j"))
                    .join(labels.select(F.col("x").alias("j"),
                                        F.col("lbl").alias("jlbl")), "j")
                    .select("x", "jlbl"))
            labels = _snap(labels.join(nb_min, "x", "left")
                           .join(jump, "x", "left")
                           .select("x", F.least(
                               F.col("lbl"), F.coalesce("nb", "lbl"),
                               F.coalesce("jlbl", "lbl")).alias("lbl"))
                           )  # _snap drops the prev reference
            new_sum = labels.agg(F.sum("lbl")).collect()[0][0]
            if new_sum == prev_sum:  # labels only decrease: fixed point
                converged = True
                break
            prev_sum = new_sum
        if not converged:
            raise RuntimeError(
                f"dup_components did not converge in {max_iter} "
                "rounds; use star-contraction for this graph")
        if checkpoint_dir is not None:
            # only the fixed point stays reachable past this line
            _prune_reliable_checkpoints(sc, resolved_ckpt, keep=1)
        finished = True
    finally:
        if checkpoint_dir is not None:
            if not finished:
                # exception escaped: no frame will ever reference this
                # call's snapshots — drop the whole private subdir now
                _delete_ckpt_subdir(sc, resolved_ckpt)
            try:
                # restore the context-global dir — the USER-FACING one:
                # getCheckpointDir() returns the resolved <dir>/<uuid>
                # child and setCheckpointDir appends a FRESH uuid to
                # whatever it is given, so restoring the resolved path
                # would nest later checkpoint() callers one level
                # deeper per call (ADVICE r10). None clears it in
                # local mode; on a cluster with no prior dir the clear
                # can throw inside Spark's path validation —
                # best-effort there.
                sc._jsc.sc().setCheckpointDir(_user_ckpt_dir(prev_ckpt))
            except Exception:  # noqa: BLE001
                pass
            _CC_CKPT_LOCK.release()
    import threading
    import weakref

    ret = labels.select(F.col("x").alias("doc_id"),
                        F.col("lbl").alias("rep"))
    _gc_cc_snapshots()
    # park this call's snapshot with a weakref to the RETURNED frame:
    # a later call releases the files only once the caller has dropped
    # it (ADVICE r10 — deleting unconditionally broke the "run two
    # dedups, then act on the first result" pattern).
    _CC_FINAL[threading.get_ident()] = (labels, sc, resolved_ckpt,
                                        weakref.ref(ret))
    return ret


def _prune_reliable_checkpoints(sc, dir_str: str, keep: int) -> None:
    """Best-effort delete of superseded rdd-* snapshot dirs under this
    call's private checkpoint subdir, keeping the newest ``keep``
    (RDD ids are monotone within a context, so numeric order is age
    order). Spark itself only reclaims reliable checkpoints with
    spark.cleaner.referenceTracking.cleanCheckpoints=true, and even
    then only at GC time — without this, a 25-round run leaves 25
    label snapshots on the cluster store. Hadoop FileSystem API so
    HDFS/S3 paths work the same as local ones."""
    try:
        root = sc._jvm.org.apache.hadoop.fs.Path(dir_str)
        fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return
        entries = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("rdd-"):
                try:
                    entries.append((int(name[4:]), st.getPath()))
                except ValueError:
                    continue
        entries.sort()
        for _, p in entries[:-keep] if keep > 0 else entries:
            fs.delete(p, True)
    except Exception:  # noqa: BLE001 — hygiene must never fail the job
        pass


def _delete_ckpt_subdir(sc, resolved: str | None) -> None:
    """Delete a call's private <dir>/<uuid> checkpoint subdir (Hadoop
    FileSystem API so HDFS/S3 paths work the same as local ones)."""
    if resolved is None:
        return
    try:
        p = sc._jvm.org.apache.hadoop.fs.Path(resolved)
        fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(p, True)
    except Exception:  # noqa: BLE001
        pass


def _gc_cc_snapshots() -> None:
    """ContextCleaner-style release of parked final-label snapshots:
    a parked entry's files are deleted ONLY once the weakref to the
    RETURNED frame is dead (the caller dropped their result) — a
    caller holding an earlier result across later dup_components calls
    keeps its snapshot alive (ADVICE r10). Still-referenced entries
    from finished threads are deferred and retried on every call; the
    localCheckpoint case (resolved None) needs no file deletion — the
    parked strong ref just drops, and Spark's ContextCleaner reclaims
    the blocks."""
    import threading

    live = {t.ident for t in threading.enumerate()}
    for k in [k for k in _CC_FINAL if k not in live]:
        _CC_DEFERRED.append(_CC_FINAL.pop(k))
    _CC_DEFERRED.append(_CC_FINAL.pop(threading.get_ident(), None))
    still_held = []
    for entry in _CC_DEFERRED:
        if entry is None:
            continue
        _df, sc, resolved, ret_ref = entry
        if ret_ref() is not None:  # caller still holds the result
            still_held.append(entry)
            continue
        _delete_ckpt_subdir(sc, resolved)
    _CC_DEFERRED[:] = still_held


# final label snapshot per thread: (labels_df, sc, resolved_ckpt_dir,
# weakref-to-returned-frame). The checkpoint blocks/files back the
# RETURNED frame, so they must outlive it; release is weakref-gated in
# _gc_cc_snapshots. _CC_DEFERRED holds entries whose returned frame
# was still referenced when a later call tried to release them.
_CC_FINAL: dict = {}
_CC_DEFERRED: list = []

import re as _re  # noqa: E402
import threading as _threading  # noqa: E402

# serializes reliable-checkpoint dup_components runs (setCheckpointDir
# is SparkContext-global; see the dup_components docstring)
_CC_CKPT_LOCK = _threading.Lock()

_UUID_RE = _re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")


def _user_ckpt_dir(resolved: str | None) -> str | None:
    """Recover the USER-FACING checkpoint dir from the resolved one:
    SparkContext.setCheckpointDir always appends a fresh UUID child,
    so getCheckpointDir() returns <user-dir>/<uuid>. Strip exactly one
    trailing UUID component (restoring the resolved path would nest a
    new UUID under it on every restore — ADVICE r10)."""
    if resolved is None:
        return None
    head, _sep, tail = resolved.rstrip("/").rpartition("/")
    return head if head and _UUID_RE.match(tail) else resolved


def _dup_components_driver(pairs: DataFrame, a_col: str,
                           b_col: str) -> DataFrame:
    """Driver-local union-find endgame for small edge sets (the
    post-LSH common case). Identical output contract to the distributed
    path: (doc_id, rep) with rep = min doc_id of the component."""
    parent: dict = {}

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:  # path compression
            parent[a], a = root, parent[a]
        return root

    pdf = pairs.select(a_col, b_col).toPandas()  # Arrow transfer
    setdefault = parent.setdefault
    for a, b in zip(pdf[a_col].tolist(), pdf[b_col].tolist()):
        setdefault(a, a)
        setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: smaller id becomes the root, so the root IS
            # the component minimum when ids are ordered
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    import pandas as pd

    nodes = sorted(parent)
    out = pd.DataFrame({"doc_id": nodes, "rep": [find(n) for n in nodes]})
    spark = pairs.sparkSession
    id_type = pairs.schema[a_col].dataType
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", id_type, False),
                           T.StructField("rep", id_type, False)])
    return spark.createDataFrame(out, schema)


def dedup_keep_list(df: DataFrame, pairs: DataFrame | None = None,
                    text_col: str = "text") -> DataFrame:
    """END-TO-END near-dedup decision list: which document of each
    near-duplicate component to KEEP. Output (doc_id, rep, quality,
    keep) for every document that belongs to a component; documents in
    no component are implicitly kept (not emitted — at corpus scale the
    non-duplicate majority should never flow through this operator).

    Representative selection: highest ``quality`` (pipeline/text.py
    heuristics) wins, ties broken by smallest doc_id — the standard
    "keep the best copy" policy rather than blind keep-first. The
    per-component argmax is a map-side-combinable max(struct) aggregate
    on the component id (no window over the corpus).

    ``pairs`` defaults to MinHash-LSH candidates; pass any
    (doc_a, doc_b) frame (simhash_pairs, ngram_jaccard_pairs,
    embedding near-dups joined back to doc ids) to change the
    near-dup definition."""
    from golem_spark.pipeline.text import quality_score

    if pairs is None:
        pairs = minhash_lsh_pairs(df, text_col)
    comp = dup_components(pairs)
    q = quality_score(df, text_col).select("doc_id", "quality")
    withq = comp.join(q, "doc_id")
    # keep_id per rep: max(struct(quality, -doc_id)) = best quality,
    # then smallest doc_id — one combinable aggregate
    best = (withq.groupBy("rep")
            .agg(F.max(F.struct(F.col("quality"),
                                (-F.col("doc_id")).alias("nid"))).alias("b"))
            .select("rep", (-F.col("b.nid")).alias("keep_id")))
    return (withq.join(best, "rep")
            .select("doc_id", "rep", "quality",
                    (F.col("doc_id") == F.col("keep_id")).alias("keep")))


def contamination_check(corpus: DataFrame, probe: DataFrame,
                        n: int = 3, min_overlap: float = 0.5,
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose n-gram
    overlap with any PROBE document (eval/test set) exceeds
    ``min_overlap``. Output (doc_id, probe_id, overlap) where overlap =
    |corpus-doc n-grams  ∩ probe n-grams| / |probe n-grams|, computed
    over distinct word n-grams.

    Scale shape: the probe side is an eval suite — thousands of
    documents, not a corpus — so its exploded n-gram frame BROADCASTS;
    the corpus is touched by exactly one scan + explode, the join is
    map-side, and the (doc, probe) overlap counts reduce with a
    combinable groupBy. Nothing shuffles at corpus scale."""
    def grams_frame(d: DataFrame, id_alias: str):
        # the overlap join only tests gram EQUALITY, so both sides carry
        # the 64-bit gram hash instead of the n-gram string — a smaller
        # probe-side broadcast and fixed-width join keys (guide §2.3).
        # Collision bound: equality-by-xxhash64 merges distinct grams
        # with birthday probability ~G^2/2^65 (G distinct grams) — ~1
        # spurious overlap hit per ~6e9 probe grams; exact at test SFs,
        # a documented approximation at 10^12-gram scale. The DuckDB
        # oracle stays STRING-keyed (tests/test_gram_hash_contract.py)
        # so any collision-visible drift fails the gate.
        grams = _ngrams_concat(tokens_col(text_col), n)
        return (d.select(F.col("doc_id").alias(id_alias),
                         F.explode(grams).alias("gram"))
                .select(id_alias, F.xxhash64("gram").alias("gram")))

    corpus_grams = grams_frame(corpus, "doc_id")
    probe_grams = grams_frame(probe, "probe_id")
    probe_sizes = probe_grams.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_probe_grams"))
    hits = (corpus_grams
            .join(F.broadcast(probe_grams), "gram")
            .filter(F.col("doc_id") != F.col("probe_id"))
            .groupBy("doc_id", "probe_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    overlap = (F.col("n_hits").cast("double")
               / F.col("n_probe_grams").cast("double"))
    return (hits.join(F.broadcast(probe_sizes), "probe_id")
            .filter(overlap >= min_overlap)
            .select("doc_id", "probe_id", F.round(overlap, 6).alias("overlap")))


def _ngrams_concat(toks, n: int):
    """Distinct word n-grams of an array column as space-joined strings.

    Built as n-1 elementwise zip_with concats over shifted slices of the
    token array rather than transform(sequence, i -> array_join(slice)):
    the per-gram slice+array_join allocates an n-element array per output
    gram, while the zip form does n-1 contiguous slices of the whole array
    and string concats — measured 4x faster on the sf0.1 documents corpus
    (explode+hash scan 4.3 -> 1.0 s at n=3, 3.9 -> 1.1 s at n=5) with
    position-exact identical output."""
    sz = F.size(toks)
    cnt = F.greatest(sz - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, cnt)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, k + 1, cnt),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.when(cnt > 0, acc)
                            .otherwise(F.array().cast("array<string>")))


def dup_ngram_fraction(df: DataFrame, n: int = 5,
                       text_col: str = "text") -> DataFrame:
    """Per-document corpus-duplication signal: the fraction of a
    document's distinct word n-grams that also occur in at least one
    OTHER document — the cheap membership version of substring dedup
    (a high fraction marks boilerplate/mirrored text for removal even
    when no single pair crosses a Jaccard threshold).

    Plan: one exploded distinct-(doc, gram) frame feeds BOTH the
    gram document-frequency aggregate and the per-doc join back —
    persisted for the query's lifetime so the corpus tokenizes once.
    Both aggregates are map-side combinable; the join shuffles on the
    gram key (bounded buckets — no gram explodes quadratically).
    Output: (doc_id, n_grams, n_shared, dup_frac).
    """
    from golem_spark.pipeline._cache import _swap_cache

    # shuffle/persist the 64-bit hash of each gram, not the gram string:
    # the membership aggregates below only test gram EQUALITY, so the
    # key can be fixed-width (guide §2.3, shuffle fewer bytes — ~8 B vs
    # the ~6*n-char n-gram string per row, and cheaper groupBy/join
    # comparisons; measured 6.6 -> 5.3 s at sf0.1). Collision bound:
    # xxhash64 merges distinct grams with birthday probability
    # ~G^2/2^65 — at 10^12 corpus grams that is ~10^4 merged keys, each
    # inflating one doc's n_shared by at most its duplicate count;
    # exact at test SFs. The DuckDB oracle stays STRING-keyed
    # (tests/test_gram_hash_contract.py) so collision-visible drift at
    # any gated SF fails the gate instead of passing silently.
    grams = (df.select(
        "doc_id",
        F.explode(_ngrams_concat(tokens_col(text_col), n)).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gram")))
    grams = _swap_cache("dup_ngram_grams", grams)
    gram_df = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("gdf"))
    return (grams.join(gram_df, "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.when(F.col("gdf") > 1, 1).otherwise(0))
                 .alias("n_shared"))
            .select("doc_id", "n_grams", "n_shared",
                    F.round(F.col("n_shared").cast("double")
                            / F.greatest(F.col("n_grams"), F.lit(1))
                            .cast("double"), 6).alias("dup_frac")))


def passage_scrub(df: DataFrame, n: int = 4, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Passage-level exact dedup (C4/RefinedWeb line-dedup analogue for
    delimiter-free text): split each document into consecutive
    ``n``-token passages, keep only the globally FIRST occurrence of
    each distinct passage (ordered by (doc_id, pos)), drop every later
    copy, and rebuild the cleaned document. The sub-passage tail
    (len % n trailing tokens) is always kept.

    Plan shape: one shuffle keyed on the passage string (the same
    map-combinable shape as exact document dedup — boilerplate passages
    hash to the same reducer at any corpus size), then a groupBy(doc)
    rebuild. The rebuilt text is emitted as an md5 fingerprint plus
    kept/total counts, so the result stays doc-sized.

    Returns (doc_id, n_chunks, n_kept, clean_md5).
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("toks"))
    n_full = F.floor(F.size("toks") / F.lit(n)).cast("int")
    idx = F.when(n_full >= 1, F.sequence(F.lit(1), n_full)) \
        .otherwise(F.array().cast("array<int>"))
    chunks = (base
              .select(id_col, F.explode(idx).alias("i"), "toks")
              .select(id_col, (F.col("i") - 1).cast("long").alias("pos"),
                      F.array_join(
                          F.slice("toks", (F.col("i") - 1) * n + 1, F.lit(n)),
                          " ").alias("chunk")))
    w = Window.partitionBy("chunk").orderBy(id_col, "pos")
    kept = (chunks.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    body = (kept.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                         lambda x: x["chunk"]),
                     " ").alias("__body")))
    tail = F.when(
        F.size("toks") - n_full * n > 0,
        F.array_join(F.slice("toks", n_full * n + 1,
                             F.size("toks") - n_full * n), " ")
    ).otherwise(F.lit(""))
    per_doc = base.select(id_col, n_full.cast("long").alias("n_chunks"),
                          tail.alias("__tail"))
    return (per_doc.join(body, on=id_col, how="left")
            .select(id_col, "n_chunks",
                    F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
                    F.md5(F.trim(F.concat_ws(
                        " ", F.coalesce("__body", F.lit("")), "__tail")))
                    .alias("clean_md5")))


def cdc_dup_fraction(df: DataFrame, divisor: int = 8,
                     text_col: str = "text") -> DataFrame:
    """Content-defined chunking dedup signal: chunk boundaries fall
    AFTER any token whose hash is 0 mod ``divisor`` (expected chunk
    length = divisor tokens), so chunk boundaries move WITH the content
    — an insertion near a document's start shifts every fixed-window
    passage (defeating passage_scrub's alignment) but leaves all
    CDC chunks after the edit identical. The rsync/backup dedup trick
    applied to corpus text.

    Plan shape: posexplode + an exclusive per-doc running sum assigns
    chunk ids (one shuffle on doc_id; the chunk-start min window reuses
    the same exchange), then each chunk reduces to a COMBINABLE
    fingerprint — the low/high 30-bit halves of ONE md5(rel_pos:token)
    summed independently, plus the token count — instead of rebuilding
    chunk text with collect_list (which shuffles every token's text
    twice). rel_pos occurs exactly once per 0..len-1, so the
    (fp1, fp2, len) triple determines the token sequence up to a sum
    collision (~2^-60 joint) — and both engines compute the identical
    sums, so the comparison is engine-consistent regardless. Returns
    (doc_id, n_chunks, n_shared, dup_frac).

    Composition: the per-document chunking+fingerprint phase
    (:func:`cdc_chunk_fingerprints`) is doc-local, so it can run
    per-micro-batch; the cross-document fold
    (:func:`cdc_dup_from_chunks`) is a combinable groupBy over the
    fingerprint triples — the split the streaming twin
    (streaming/monitors.py::cdc_dedup_sink) exploits.
    """
    return cdc_dup_from_chunks(cdc_chunk_fingerprints(df, divisor, text_col))


def cdc_chunk_fingerprints(df: DataFrame, divisor: int = 8,
                           text_col: str = "text") -> DataFrame:
    """Per-document CDC chunk fingerprints (doc_id, chunk_idx, fp1,
    fp2, fp_len) — the doc-LOCAL phase of :func:`cdc_dup_fraction`
    (every row derives from one document, so any partition of the
    corpus into micro-batches computes identical rows)."""
    from pyspark.sql import Window

    toks = df.select("doc_id", F.posexplode(tokens_col(text_col))
                     .alias("pos", "tok"))
    flag = (_md5_int(F.col("tok")) % divisor == 0).cast("int")
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    chunked = toks.withColumn(
        "chunk_idx", F.coalesce(F.sum(flag).over(w), F.lit(0)))
    rel = (F.col("pos")
           - F.min("pos").over(Window.partitionBy("doc_id", "chunk_idx")))
    h = _md5_int(F.concat_ws(":", rel.cast("string"), F.col("tok")))
    return (chunked
            .withColumn("__h", h)
            .groupBy("doc_id", "chunk_idx")
            .agg(F.sum(F.col("__h") % F.lit(1 << 30)).alias("fp1"),
                 F.sum(F.shiftright("__h", 30)).alias("fp2"),
                 F.count(F.lit(1)).alias("fp_len")))


def cdc_dup_from_chunks(chunks: DataFrame) -> DataFrame:
    """Cross-document fold of :func:`cdc_chunk_fingerprints` output:
    per-fingerprint document frequency, then per-doc shared-chunk
    fraction. Combinable groupBys only — runs identically over a batch
    frame or an accumulated per-micro-batch store."""
    gdf = chunks.groupBy("fp1", "fp2", "fp_len").agg(
        F.countDistinct("doc_id").alias("gdf"))
    return (chunks.join(gdf, ["fp1", "fp2", "fp_len"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(F.when(F.col("gdf") > 1, 1).otherwise(0))
                 .cast("long").alias("n_shared"))
            .select("doc_id", "n_chunks", "n_shared",
                    F.round(F.col("n_shared")
                            / F.greatest(F.col("n_chunks"), F.lit(1)), 6)
                    .alias("dup_frac")))


def benchmark_containment(corpus: DataFrame, benchmark: DataFrame,
                          n: int = 3, text_col: str = "text") -> DataFrame:
    """Fuzzy decontamination score: per corpus document, the fraction
    of ITS distinct word n-grams that appear anywhere in the benchmark
    set — containment(doc) = |grams(doc) ∩ grams(bench)| / |grams(doc)|.
    The dual of :func:`contamination_check` (which normalizes by the
    probe's grams): containment catches train documents that quote part
    of an eval item even when the eval item is much longer.

    Scale shape: the benchmark is an eval suite, not a corpus — its
    DISTINCT gram set broadcasts; the corpus is one scan + explode, the
    membership join is map-side, and per-doc counts reduce with a
    combinable groupBy. Docs with zero matched grams are preserved via
    a left join (containment 0.0)."""
    # membership only needs gram EQUALITY: both sides carry the 64-bit
    # gram hash, shrinking the benchmark broadcast and the join keys to
    # fixed width (guide §2.3). Collision bound: a corpus gram can
    # spuriously match a benchmark gram with probability
    # |bench grams|/2^64 — ~5e-14 per gram for a 10^6-gram suite, so
    # containment inflates by <1e-13 in expectation; exact at test SFs.
    # The DuckDB oracle stays STRING-keyed
    # (tests/test_gram_hash_contract.py).
    grams = _ngrams_concat(tokens_col(text_col), n)
    corpus_grams = (corpus.select("doc_id", F.explode(grams).alias("gram"))
                    .select("doc_id", F.xxhash64("gram").alias("gram")))
    bench_grams = (benchmark.select(F.explode(grams).alias("gram"))
                   .select(F.xxhash64("gram").alias("gram"))
                   .distinct())
    matched = (corpus_grams
               .join(F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
                     "gram", "left")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                    .cast("long").alias("n_matched")))
    return matched.select(
        "doc_id", "n_grams", "n_matched",
        F.round(F.col("n_matched").cast("double")
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                6).alias("containment"))


def cluster_stats(components: DataFrame, rep_col: str = "rep") -> DataFrame:
    """Dedup-cluster bookkeeping over :func:`dup_components` output:
    one row per near-duplicate cluster — representative, size, id
    range — the numbers a dedup pass reports before dropping
    non-representatives. One combinable groupBy on the rep key."""
    return (components.groupBy(rep_col)
            .agg(F.count(F.lit(1)).cast("long").alias("size"),
                 F.min("doc_id").cast("long").alias("min_doc"),
                 F.max("doc_id").cast("long").alias("max_doc"))
            .withColumn("n_dropped", (F.col("size") - 1).cast("long")))
