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
