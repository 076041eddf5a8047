"""Deduplication operators over the documents table.

Four strategies, all deterministic and shuffle-conscious:

- exact: md5 content hash -> groupBy (one shuffle on the hash; at scale
  this is the classic map-side-combinable exact dedup).
- n-gram Jaccard: word-set Jaccard within (lang, length-bucket) blocks —
  blocking turns the O(n^2) pair space into per-block joins; the block
  key is the shuffle key, so skew is bounded by block size.
- MinHash + LSH: k=8 deterministic min-hashes over distinct tokens,
  banded 4x2; candidate pairs = same (band, band-hash) bucket — the
  standard sub-quadratic near-dup path for 100 TB corpora.
- SimHash: 16-bit sign-sum fingerprint; near-dups = hamming <= 2 within
  blocks (bit_count(xor) both engines).

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
                        text_col: str = "text",
                        bitmask_vocab_limit: int = 4096) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within (lang,
    length-bucket) blocks. Output (doc_a, doc_b, jaccard).

    When the distinct-token vocabulary is small (<= bitmask_vocab_limit)
    each document's token set is packed into 64-bit words and Jaccard
    becomes popcount(a&b)/popcount(a|b) — pure integer ops per candidate
    pair instead of array intersections (identical results, ~10x less
    pair-compare cost). Large vocabularies fall back to array ops."""
    vocab = (df.select(F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
             .distinct())
    vocab_size = vocab.count()
    if vocab_size <= bitmask_vocab_limit:
        return _jaccard_pairs_bitmask(df, vocab, vocab_size, threshold, text_col)
    return _jaccard_pairs_arrays(df, threshold, text_col)


def _jaccard_pairs_bitmask(df: DataFrame, vocab: DataFrame, vocab_size: int,
                           threshold: float, text_col: str) -> DataFrame:
    from pyspark.sql import Window

    n_words = (vocab_size + 62) // 63  # 63 bits per long (avoid sign bit)
    vocab_ids = vocab.withColumn(
        "tok_id", F.row_number().over(Window.orderBy("tok")) - 1)
    toks = (df.select("doc_id", F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
            .join(F.broadcast(vocab_ids), "tok"))
    word = (F.col("tok_id") / 63).cast("int")
    # F.shiftleft only takes a literal count; the SQL form accepts a column
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tok_id % 63 AS INT))")
    masks = toks.groupBy("doc_id").agg(
        *[F.bit_or(F.when(word == w, bit).otherwise(0)).alias(f"m{w}")
          for w in range(n_words)],
        F.count(F.lit(1)).alias("n_toks"))
    base = masks.join(df.select("doc_id", *_block_key()), "doc_id")
    a = base.alias("a")
    b = base.alias("b")
    inter = None
    union = None
    for w in range(n_words):
        i_w = F.bit_count(F.col(f"a.m{w}").bitwiseAND(F.col(f"b.m{w}")))
        u_w = F.bit_count(F.col(f"a.m{w}").bitwiseOR(F.col(f"b.m{w}")))
        inter = i_w if inter is None else inter + i_w
        union = u_w if union is None else union + u_w
    jac = inter.cast("double") / union.cast("double")
    return (a.join(b, on=[F.col("a.lang") == F.col("b.lang"),
                          F.col("a.len_bucket") == F.col("b.len_bucket"),
                          F.col("a.doc_id") < F.col("b.doc_id"),
                          F.col("a.n_toks") * 2 >= F.col("b.n_toks"),
                          F.col("b.n_toks") * 2 >= F.col("a.n_toks")])
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")))


def _jaccard_pairs_arrays(df: DataFrame, threshold: float,
                          text_col: str) -> DataFrame:
    toks = F.array_distinct(tokens_col(text_col))
    base = df.select(
        F.col("doc_id"), F.col("lang"),
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        toks.alias("toks")).withColumn("n_toks", F.size("toks"))
    a = base.alias("a")
    b = base.alias("b")
    # size prefilter is IMPLIED by jaccard >= 0.5 (min/max set-size ratio
    # bounds Jaccard), so it prunes pairs without changing the result
    j = (a.join(b, on=[F.col("a.lang") == F.col("b.lang"),
                       F.col("a.len_bucket") == F.col("b.len_bucket"),
                       F.col("a.doc_id") < F.col("b.doc_id"),
                       F.col("a.n_toks") * 2 >= F.col("b.n_toks"),
                       F.col("b.n_toks") * 2 >= F.col("a.n_toks")])
         .select(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"),
                 (F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("double")
                  / F.size(F.array_union(F.col("a.toks"), F.col("b.toks"))).cast("double")
                  ).alias("jaccard")))
    return j.filter(F.col("jaccard") >= threshold) \
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


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


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidate pairs: band signatures (4 bands x 2 rows) blocked by
    (lang, length-bucket); documents sharing any band bucket within a
    block become a candidate pair. Output (doc_a, doc_b, n_shared_bands).

    Blocking bounds bucket skew: the shuffle key is (block, band, bkey),
    so a pathologically common signature cannot concentrate a corpus-
    sized bucket on one reducer."""
    sig = minhash_signatures(df, text_col).join(
        df.select("doc_id", *_block_key()), "doc_id")
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        key = F.concat_ws("_", *[c.cast("string") for c in cols])
        bands.append(sig.select("doc_id", "lang", "len_bucket",
                                F.lit(b).alias("band"), key.alias("bkey")))
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
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


def simhash_pairs(df: DataFrame, max_hamming: int = 2,
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming within (lang,
    length-bucket) blocks. Output (doc_a, doc_b, hamming)."""
    sh = simhash(df, text_col=text_col)
    meta = df.select("doc_id", *_block_key())
    full = sh.join(meta, "doc_id")
    a = full.alias("a")
    b = full.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, on=[F.col("a.lang") == F.col("b.lang"),
                          F.col("a.len_bucket") == F.col("b.len_bucket"),
                          F.col("a.doc_id") < F.col("b.doc_id")])
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
