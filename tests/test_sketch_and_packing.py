"""Round-4 operators: KMV/CMS sketches, LM scoring, chunking, sequence
packing, duplicate-ngram fraction, JSON extraction."""

import pytest
from pyspark.sql import functions as F

from golem_spark.operators import relational
from golem_spark.pipeline import dedup, sketch, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 44),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
        (2, "aardvark bespoke chthonic dirigible ephemeral", "en", "s2", 45),
        (3, "the the the the the the the the the", "en", "s3", 35),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v long")
    row = sketch.kmv_distinct(df, "v", k=64).first()
    assert row["exact_distinct"] == 10
    assert row["est_distinct"] == 10.0
    assert row["rel_err"] == 0.0


def test_kmv_estimates_large_cardinality(spark):
    df = spark.range(5000).select(F.col("id").alias("v"))
    row = sketch.kmv_distinct(df, "v", k=256).first()
    assert row["exact_distinct"] == 5000
    # KMV with k=256 has ~1/sqrt(k-2) ~ 6% relative std error
    assert abs(row["rel_err"]) < 0.25


def test_cms_never_undercounts(docs):
    rows = sketch.cms_token_freq(docs, top_k=50).collect()
    assert rows, "expected probe rows"
    for r in rows:
        assert r["cms_count"] >= r["true_count"]
        assert r["overcount"] == r["cms_count"] - r["true_count"]
    top = rows[0]
    assert top["tok"] == "the"
    assert top["true_count"] == 13  # 2x2 + 9


def test_lm_score_orders_rare_vs_common(docs):
    out = {r["doc_id"]: r for r in text.lm_score(docs).collect()}
    # all-stopword doc scores highest; all-rare-token doc lowest
    assert out[3]["lm_logprob"] > out[0]["lm_logprob"] > out[2]["lm_logprob"]
    assert out[0]["n_tokens"] == 9


def test_chunk_tokens_shapes(docs):
    out = text.chunk_tokens(docs, chunk_size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0 has 9 tokens, stride 3 -> ceil((9-1)/3) = 3 chunks
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c0] == [0, 1, 2]
    assert [r["chunk_tokens"] for r in c0] == [4, 4, 3]
    # identical docs produce identical chunk hashes
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_hash"] for r in c0] == [r["chunk_hash"] for r in c1]
    with pytest.raises(ValueError):
        text.chunk_tokens(docs, chunk_size=4, overlap=4)


def test_pack_sequences_prefix_sum_and_bins(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 13) for i in range(200)], "doc_id long, n long")
    out = relational.pack_sequences(df, "n", "doc_id", capacity=100).collect()
    rows = sorted(out, key=lambda r: r["doc_id"])
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum
        assert r["bin_id"] == cum // 100
        cum += r["n"]


def test_pack_sequences_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, 1 + i % 5) for i in range(300)], "doc_id long, n long")
    a = {r["doc_id"]: (r["cum_before"], r["bin_id"])
         for r in relational.pack_sequences(df, "n", "doc_id", 64).collect()}
    b = {r["doc_id"]: (r["cum_before"], r["bin_id"])
         for r in relational.pack_sequences(
             df.repartition(17), "n", "doc_id", 64, n_buckets=5).collect()}
    assert a == b


def test_dup_ngram_fraction_planted(docs):
    out = {r["doc_id"]: r for r in
           dedup.dup_ngram_fraction(docs, n=3).collect()}
    assert out[0]["dup_frac"] == 1.0   # exact dup pair 0/1
    assert out[1]["dup_frac"] == 1.0
    assert out[2]["dup_frac"] == 0.0   # unique content
    assert out[0]["n_grams"] == 7


def test_json_extract_column(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("a", '{"k": 5}'), ("b", '{"k": 7}')],
        "event_type string, props string")
    out = (df.select("event_type",
                     F.get_json_object("props", "$.k").cast("long").alias("k"))
           .groupBy("event_type").agg(F.avg("k").alias("avg_k"))
           .orderBy("event_type").collect())
    assert out[0]["avg_k"] == 4.0 and out[1]["avg_k"] == 7.0


def test_hll_distinct_estimate_reasonable(spark):
    """HLL with m=64 has ~13% standard error; the self-audit column must
    show the estimate lands near the exact count, and the register build
    must be invariant to partitioning."""
    import pytest as _pytest

    from golem_spark.pipeline.sketch import hll_distinct
    from golem_spark.session import load_tables

    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    row = hll_distinct(li, "l_partkey").first()
    assert abs(row["rel_err"]) < 0.45
    row2 = hll_distinct(li.repartition(7), "l_partkey").first()
    assert row.asDict() == row2.asDict()
    with _pytest.raises(ValueError):
        hll_distinct(li, "l_partkey", n_buckets=48)


def test_hll_linear_counting_small_range(spark):
    """With far fewer distincts than 2.5m the LinearCounting branch must
    engage and be near-exact."""
    from golem_spark.pipeline.sketch import hll_distinct

    df = spark.range(12).selectExpr("id % 5 AS v")
    row = hll_distinct(df, "v").first()
    assert row["exact_distinct"] == 5
    assert abs(row["est_distinct"] - 5) < 2


def test_vocab_coverage_monotone_and_bounded(spark):
    from golem_spark.pipeline.text import vocab_coverage
    from golem_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    rows = vocab_coverage(docs, top_k=20).orderBy("rank").collect()
    assert len(rows) == 20
    fracs = [r["cum_frac"] for r in rows]
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))
    assert 0 < fracs[-1] <= 1.0
    cnts = [r["cnt"] for r in rows]
    assert all(a >= b for a, b in zip(cnts, cnts[1:]))


def test_passage_scrub_drops_repeats_keeps_tail(spark):
    from golem_spark.pipeline.dedup import passage_scrub

    df = spark.createDataFrame(
        [(1, "a b c d x y"),        # chunk 'a b c d' first seen here
         (2, "a b c d q r s t z")],  # repeated chunk dropped; own chunk + tail kept
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in passage_scrub(df, n=4).collect()}
    assert rows[1]["n_chunks"] == 1 and rows[1]["n_kept"] == 1
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 1
    import hashlib
    assert rows[1]["clean_md5"] == hashlib.md5(b"a b c d x y").hexdigest()
    assert rows[2]["clean_md5"] == hashlib.md5(b"q r s t z").hexdigest()


def test_kmeans_step_partitions_all_vectors(spark):
    from golem_spark.pipeline.similarity import kmeans_step, label_centroids
    from golem_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    n = emb.count()
    out = kmeans_step(emb, k=8).collect()
    assert sum(r["n_assigned"] for r in out) == n
    assert all(-1.0 <= r["mean_cos"] <= 1.0 for r in out)

    cents = {r["label"]: r for r in label_centroids(emb).collect()}
    assert sum(r["n_members"] for r in cents.values()) == n
    assert all(-1.0 <= r["avg_cos"] <= 1.0 for r in cents.values())


def test_bloom_probe_no_false_negatives(spark):
    """Every true member must pass (bloom filters never miss); false
    positives are counted honestly."""
    import pytest as _pytest

    from golem_spark.pipeline.sketch import bloom_probe
    from golem_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    probe = docs.filter(F.col("doc_id") % 2 == 1)
    row = bloom_probe(corpus, probe, n=5, m_bits=4096, depth=3).first()
    assert row["n_pass"] >= row["n_true"]
    assert row["n_false_pos"] == row["n_pass"] - row["n_true"]
    assert 0 <= row["n_bits_set"] <= 4096
    assert 0.0 <= row["fpr"] <= 1.0
    with _pytest.raises(ValueError):
        bloom_probe(corpus, probe, m_bits=16)


def test_ntile_buckets_balanced(spark):
    from golem_spark.operators.relational import ntile_buckets

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(10)], ["grp", "id", "v"])
    out = ntile_buckets(df, "grp", ["v", "id"], n_tiles=4).collect()
    sizes = {}
    for r in out:
        sizes[r["tile"]] = sizes.get(r["tile"], 0) + 1
    # NTILE distributes 10 rows over 4 tiles as 3/3/2/2
    assert sorted(sizes.values(), reverse=True) == [3, 3, 2, 2]
    # lowest values land in tile 1
    lows = [r["tile"] for r in out if r["v"] <= 2.0]
    assert set(lows) == {1}


def test_winsorize_clips_only_tails(spark):
    from golem_spark.operators.relational import winsorize_by_group

    rows = [("g", i, float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["grp", "id", "v"])
    out = {r["id"]: r["v_w"] for r in
           winsorize_by_group(df, "grp", "v", lo=0.1, hi=0.9).collect()}
    # percentile_disc(0.1) of 1..20 = 2; (0.9) = 18
    assert out[1] == 2.0 and out[20] == 18.0
    assert out[10] == 10.0 and out[2] == 2.0 and out[18] == 18.0


def test_kmv_join_estimate_exact_when_k_covers_keys(spark):
    """With k >= all distinct keys the sketches are lossless and the
    per-key-uniform multiplicity assumption holds exactly on uniform
    data -> the join estimate equals the exact join count."""
    import pandas as pd
    from pyspark.sql import functions as F

    from golem_spark.pipeline.sketch import kmv_join_estimate

    # 30 keys, a appears 2x per key, b 3x per key -> join = 30*6
    a = spark.createDataFrame(pd.DataFrame(
        {"ka": [k for k in range(30) for _ in range(2)]}))
    b = spark.createDataFrame(pd.DataFrame(
        {"kb": [k for k in range(30) for _ in range(3)]}))
    r = kmv_join_estimate(a, "ka", b, "kb", k=128).collect()[0]
    assert r["exact_join_rows"] == 180
    assert r["jaccard"] == 1.0
    assert abs(r["est_join_rows"] - 180.0) < 1e-6
    assert r["rel_err"] == 0.0


def test_unigram_kl_identity_and_positive(spark):
    from pyspark.sql import functions as F

    from golem_spark.pipeline.text import unigram_kl
    from golem_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    same = unigram_kl(docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "src0").otherwise("src1")),
        "src0", "src0").collect()[0]
    # KL of a distribution against itself is exactly 0
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0
    diff = unigram_kl(docs, "src0", "src1").collect()[0]
    assert diff["kl_ab"] >= 0.0 and diff["kl_ba"] >= 0.0
    assert diff["vocab"] > 0


def test_kmv_join_estimate_disjoint_keys(spark):
    """Disjoint key sets: Jaccard 0, zero estimated and exact join."""
    import pandas as pd

    from golem_spark.pipeline.sketch import kmv_join_estimate

    a = spark.createDataFrame(pd.DataFrame({"ka": list(range(0, 40))}))
    b = spark.createDataFrame(pd.DataFrame({"kb": list(range(100, 140))}))
    r = kmv_join_estimate(a, "ka", b, "kb", k=128).collect()[0]
    assert r["jaccard"] == 0.0
    assert r["est_join_rows"] == 0.0
    assert r["exact_join_rows"] == 0
