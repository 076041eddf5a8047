"""Round-2 hygiene gates: ANSI-safe fold hashing, integer-precision
as-of ordering, bounded executor-cache growth across repeated pipeline
calls."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_fold_hash_matches_numpy_under_ansi(spark):
    """train_owl_spark's fold column must equal fold_ids() bit-for-bit,
    including with ANSI mode ON (the raw 64-bit multiply would throw)."""
    from golem_spark.cv import fold_ids

    keys = np.array([0, 1, 7, 12345, 2**31 - 1, 2**31, 2**40 + 17,
                     2**52 + 3, 2**62 + 11], dtype=np.int64)
    want = {rep: fold_ids(keys.copy(), 10, rep) for rep in (0, 1, 3)}

    pdf = pd.DataFrame({"k": keys})
    df = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        C, M32 = 2654435761, 4294967296
        c16 = (C << 16) % M32
        for rep in (0, 1, 3):
            k32 = F.pmod(F.pmod(F.col("k"), F.lit(M32))
                         + F.lit(rep * 1_000_003), F.lit(M32))
            k_lo = F.pmod(k32, F.lit(65536))
            k_hi = F.floor(k32 / F.lit(65536.0)).cast("long")
            h32 = F.pmod(k_hi * F.lit(c16) + k_lo * F.lit(C), F.lit(M32))
            fold = F.pmod(h32, F.lit(10))
            got = np.array([r["f"] for r in df.select(F.col("k"), fold.alias("f"))
                            .orderBy("k").collect()])  # keys are ascending
            np.testing.assert_array_equal(got, want[rep])
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_asof_join_preserves_nanosecond_order(spark):
    """Two right rows 1 ns apart near 2^60 must resolve correctly — a
    double cast collapses them (~256 ns granularity at epoch-nanos)."""
    from golem_spark.operators.relational import asof_join

    t0 = (1 << 60) + 123456789
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [t0 + 1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [t0, t0 + 1], "v": [10.0, 20.0]}))
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="ts",
                    right_cols=["v"]).collect()
    # the row AT t0+1 (== left ts) wins, not the one 1 ns earlier
    assert out[0]["v_asof"] == 20.0

    left2 = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [t0]}))
    out2 = asof_join(left2, right, key="k", left_ts="ts", right_ts="ts",
                     right_cols=["v"]).collect()
    assert out2[0]["v_asof"] == 10.0


def test_pipeline_cache_growth_is_bounded(spark):
    """Repeated similarity calls must not accumulate persisted frames
    (the swap-slot pattern unpersists the previous call's cache)."""
    from golem_spark.session import load_tables
    from golem_spark.pipeline.similarity import (
        ann_lsh_topk, ann_ivf_topk, embedding_near_dup_pairs)

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    jsc = spark.sparkContext._jsc.sc()
    # one warm-up round establishes the operators' steady-state cache
    # slots; other operators run earlier in the session may hold their
    # own bounded slots, so assert NO GROWTH rather than a global count
    ann_lsh_topk(emb, query_ids=(0,), k=3).count()
    ann_ivf_topk(emb, query_ids=(0,), k=3, n_seeds=4).count()
    embedding_near_dup_pairs(emb, threshold=0.99).count()
    steady = jsc.getPersistentRDDs().size()
    for _ in range(3):
        ann_lsh_topk(emb, query_ids=(0,), k=3).count()
        ann_ivf_topk(emb, query_ids=(0,), k=3, n_seeds=4).count()
        embedding_near_dup_pairs(emb, threshold=0.99).count()
    n_cached = jsc.getPersistentRDDs().size()
    assert n_cached <= steady, \
        f"cache leak: {steady} -> {n_cached} persisted RDDs"


def test_pipeline_cache_sweeps_dead_threads(spark):
    """Frames persisted from short-lived worker threads (the per-call
    ThreadPoolExecutor pattern in cv.py) must be swept once their thread
    exits — otherwise each pool creation pins frames until SparkContext
    shutdown."""
    import threading

    from golem_spark.pipeline import _cache
    from golem_spark.session import load_tables
    from golem_spark.pipeline.similarity import ann_lsh_topk

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]

    def _work():
        ann_lsh_topk(emb, query_ids=(0,), k=3).count()

    for _ in range(3):
        t = threading.Thread(target=_work)
        t.start()
        t.join()

    dead_keys = [k for k in _cache._LIVE_CACHES
                 if k[1] not in {t.ident for t in threading.enumerate()}]
    # entries from the dead threads linger until the next swap...
    _work()  # ...which runs on this (live) thread and sweeps them
    live = {t.ident for t in threading.enumerate()}
    assert all(k[1] in live for k in _cache._LIVE_CACHES), \
        f"dead-thread cache entries not swept: {dead_keys}"


def test_pagerank_repeated_calls_release_snapshots(spark):
    """Each pagerank call's final persisted rank snapshot must be
    released by the next call — repeated graph queries must not
    accumulate persisted frames."""
    import threading

    from golem_spark.operators.graph import pagerank
    from golem_spark.pipeline import _cache

    edges = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a != b],
        ["src", "dst"])
    for _ in range(3):
        pagerank(edges, iterations=3).count()
    key_slots = [k[0] for k in _cache._LIVE_CACHES
                 if k[1] == threading.get_ident()
                 and k[0].startswith("pagerank")]
    # one live frame per pagerank slot at most, regardless of call count
    assert len(key_slots) == len(set(key_slots))


def test_shared_caches_survive_concurrent_verifiers(spark):
    """Two concurrent verifier threads (the verify_oracle --jobs=2
    shape) racing the SAME first-build must (a) return identical
    results — no cross-contamination — and (b) leave exactly one
    shared build behind: re-running serially afterwards persists
    nothing new (a lost build race would pin an orphaned frame for the
    session lifetime)."""
    import sys
    from concurrent.futures import ThreadPoolExecutor

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    # covers all three cross-thread shared caches: kernels._DEDUP_SHARED
    # (p08 pairs / p92 components), glm_queries._WIDE_CTX (wide stats +
    # encoded frame + gram_cache)
    names = ["p08_minhash_lsh_pairs", "p92_dup_cluster_stats",
             "glm_gaussian_wide_sparse", "glm_poisson_wide_sparse"]

    def run(name):
        return tuple(sorted(map(str, qs[name](spark, sf).collect())))

    # race each query against itself AND the others (8 concurrent jobs)
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [(n, pool.submit(run, n), pool.submit(run, n))
                for n in names]
        results = {n: (a.result(), b.result()) for n, a, b in futs}
    for n, (a, b) in results.items():
        assert a == b, f"concurrent runs of {n} disagree"

    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    for n, (a, _) in results.items():
        assert run(n) == a, f"serial re-run of {n} disagrees"
    assert jsc.getPersistentRDDs().size() <= baseline, \
        "serial re-run after concurrent warm-up persisted new frames"
