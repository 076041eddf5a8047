"""Text-analysis operators over the documents table.

All pure column expressions (whole-stage codegen; no UDFs): token
counting, quality scoring, n-gram-heuristic language ID, and polynomial
document fingerprinting. Deterministic by construction so each has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic 60-bit integer from a string, identical in Spark
# (CONV(SUBSTRING(MD5(s),1,15),16,10)) and DuckDB
# (('0x'||substr(md5(s),1,15))::BIGINT)
def _md5_int(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_PUNCT_RE = r"[.,!?;:]"

# tiny per-language marker lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]


def tokens_col(text_col: str = "text"):
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens (whitespace tokens) and a BPE-ish subword estimate
    (tokens x ceil(mean_wordlen/4) heuristic via char count)."""
    toks = tokens_col(text_col)
    return (df
            .withColumn("n_tokens", F.size(toks).cast("long"))
            .withColumn("n_chars_calc", F.length(F.col(text_col)).cast("long"))
            .withColumn("n_subword_est",
                        F.ceil(F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                               / F.lit(4.0)).cast("long")))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics + composite
    score in [0,1]."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(F.col(text_col)).cast("double")
    punct = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), _PUNCT_RE, ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    mean_wordlen = (n_char - (n_tok - 1)) / n_tok
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct.cast("double") / F.greatest(n_char, F.lit(1.0)) * F.lit(10.0), F.lit(1.0))) * F.lit(0.3)
        + F.least(n_stop / F.greatest(n_tok, F.lit(1.0)) * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
    )
    return (df
            .withColumn("q_n_tokens", n_tok)
            .withColumn("q_punct_ratio", F.round(punct.cast("double") / F.greatest(n_char, F.lit(1.0)), 6))
            .withColumn("q_stop_ratio", F.round(n_stop / F.greatest(n_tok, F.lit(1.0)), 6))
            .withColumn("q_mean_wordlen", F.round(mean_wordlen, 6))
            .withColumn("quality", F.round(score, 6)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax language by marker hits, 'und'
    (undetermined) when no marker fires. Deterministic tie-break by
    language code order."""
    toks = tokens_col(text_col)
    def _contains(arr):
        return lambda t: F.array_contains(arr, t)

    hit_cols = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, _contains(arr)))
        hit_cols.append((lang, hits))
    # argmax with first-code-wins tie-break (strict > keeps earlier code)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, hits in hit_cols:
        take = hits > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, hits).otherwise(best_n)
    return df.withColumn("lang_pred", best).withColumn("lang_hits", best_n.cast("long"))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted polynomial fingerprint:
    sum_i (md5int(word_i) % 1e9) * (i+1) mod 2^31 — a rolling-hash-style
    content fingerprint, exact-duplicate sensitive and order sensitive."""
    toks = tokens_col(text_col)
    term = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.size(toks)),
        lambda w, i: (F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
                      % F.lit(1000000000)) * i.cast("long"),
    )
    fp = F.aggregate(term, F.lit(0).cast("long"), lambda acc, x: acc + x) % F.lit(2147483648)
    return df.withColumn("fingerprint", fp)


def _rank_vocab(vocab: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Assign ``term_idx`` = dense global rank by (df DESC, tok ASC)
    WITHOUT a vocabulary-global window.

    Two-phase distributed ranking over literal range boundaries:

    1. hash-sample ~4k (df, tok) keys (deterministic md5 predicate),
       sort them on the driver, keep every (len/n_buckets)-th as a
       boundary — embedded as plan LITERALS, so every pass and every
       recompute sees identical bucket assignment;
    2. count rows per bucket (n_buckets rows to the driver) -> prefix
       offsets, broadcast back as a literal map;
    3. row_number over Window.partitionBy(bucket) + offset — each
       bucket ranks in parallel; buckets are ~|vocab|/n_buckets up to
       sampling error, never the whole vocabulary on one task.

    The comparison used for bucket assignment is exactly the rank
    order's ((dfb > df) OR (dfb = df AND tok >= tokb)), so bucket
    boundaries are order-consistent and ranks are exact.
    """
    from pyspark.sql import Window

    from golem_spark.pipeline._cache import _swap_cache

    vocab = _swap_cache("tfidf_vocab", vocab)
    nv = vocab.count()
    rate = max(1, nv // 4096)
    tok_h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10) \
        .cast("long")
    sampled = sorted(
        ((-r["df"], r["tok"]) for r in
         vocab.filter(tok_h % rate == 0).select("df", "tok").collect()))
    step = max(1, len(sampled) // n_buckets)
    bounds = [(-negdf, tok) for negdf, tok in sampled[step::step]]

    def bucket_of():
        # bucket = number of boundaries at-or-before this row in
        # (df DESC, tok ASC) order; boundaries are literals.
        b = F.lit(0)
        for dfb, tokb in bounds:
            passed = (F.col("df") < F.lit(dfb)) | (
                (F.col("df") == F.lit(dfb)) & (F.col("tok") >= F.lit(tokb)))
            b = b + passed.cast("int")
        return b

    with_b = vocab.withColumn("__b", bucket_of())
    counts = sorted(
        ((r["__b"], r["cnt"]) for r in
         with_b.groupBy("__b").agg(F.count(F.lit(1)).alias("cnt"))
         .collect()))
    offsets, acc = {}, 0
    for bid, cnt in counts:
        offsets[bid] = acc
        acc += cnt
    if not offsets:
        offsets = {0: 0}
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])[F.col("__b")]
    w = Window.partitionBy("__b").orderBy(F.desc("df"), "tok")
    return (with_b
            .withColumn("term_idx",
                        F.row_number().over(w) + off_expr - 1)
            .drop("__b"))


def tfidf_vectors(df: DataFrame, text_col: str = "text",
                  min_df: int = 2) -> DataFrame:
    """Per-document TF-IDF as SPARSE (indices, values) arrays — the
    bridge from the text pipeline into the sparse GLM backend: the
    output feeds ``owl(df=..., sparse_features=("idx", "val"),
    sparse_p=<vocab size>)`` directly.

    Vocabulary = tokens appearing in >= min_df documents, term ids
    assigned by (document frequency DESC, token) — deterministic across
    engines. Weight = tf * (ln((N+1)/(df+1)) + 1) (smoothed idf).

    Scale notes: tf and df are plain groupBy aggregates (map-side
    combinable); term ids come from a TWO-PHASE distributed rank (the
    ``operators/relational.py::global_quantiles`` pattern): a
    deterministic hash-sample of (df, tok) keys picks ~64 literal range
    boundaries, a bucket-count pass turns them into broadcast rank
    offsets, and a per-BUCKET row_number finishes the global rank — no
    vocabulary-global single-task window (a web-scale vocab can be 10^8
    rows). Boundary literals are embedded in the plan, and the rank
    order (df DESC, tok) is total, so term ids are partitioning- and
    recompute-invariant. Per-doc arrays are built with collect_list +
    array_sort, never a driver collect.
    """
    from golem_spark.pipeline._cache import _swap_cache

    toks = df.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    # tf feeds BOTH the document-frequency/vocab build and the cells
    # join below — persist so the corpus explode + (doc, tok) shuffle
    # run once, not once per consumer
    tf = _swap_cache(
        "tfidf_tf",
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    vocab = _rank_vocab(dfreq.filter(F.col("df") >= min_df))
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 1.0)) + 1.0
    cells = (tf.join(vocab, "tok")
             .select("doc_id", "term_idx",
                     (F.col("tf") * idf).alias("w")))
    pairs = (cells.groupBy("doc_id")
             .agg(F.array_sort(F.collect_list(
                 F.struct("term_idx", "w"))).alias("cells")))
    return pairs.select(
        "doc_id",
        F.transform("cells", lambda c: c["term_idx"]).alias("idx"),
        F.transform("cells", lambda c: F.round(c["w"], 6)).alias("val"))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - ``dup_token_frac``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total),
    - ``dup_bigram_frac``: same over word bigrams,
    - ``top_bigram_frac``: occurrence share of the most frequent bigram.

    High values flag boilerplate/spam for corpus filtering. All pure
    array expressions over one row — embarrassingly parallel, zero
    shuffle, scales linearly with the corpus. The per-doc top-bigram
    scan is O(distinct x total) on the (short) document, not the
    corpus."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    nb = F.size(grams)
    top_cnt = F.array_max(F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g))))
    return (df
            .withColumn("dup_token_frac",
                        F.round((n - F.size(F.array_distinct(toks))).cast("double")
                                / F.greatest(n, F.lit(1)).cast("double"), 6))
            .withColumn("dup_bigram_frac",
                        F.round((nb - F.size(F.array_distinct(grams))).cast("double")
                                / F.greatest(nb, F.lit(1)).cast("double"), 6))
            .withColumn("top_bigram_frac",
                        F.round(F.coalesce(top_cnt.cast("double"), F.lit(0.0))
                                / F.greatest(nb, F.lit(1)).cast("double"), 6)))


def bigram_vocab(df: DataFrame, top_k: int = 100,
                 text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k word bigrams by occurrence count — the
    vocabulary-mining substrate (BPE-merge candidates, collocation
    stats). Output (bigram, n), ordered by (n desc, bigram).

    One explode + one map-side-combinable groupBy; the final top-k is a
    TakeOrdered over the aggregated vocabulary (bigram-cardinality
    sized, not corpus sized)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    return (df.select(F.explode(grams).alias("bigram"))
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "bigram")
            .limit(top_k))


def inverted_index(df: DataFrame, max_postings: int = 20,
                   text_col: str = "text") -> DataFrame:
    """Token -> (document frequency, capped posting list) inverted
    index. Output (tok, df, postings) with postings the first
    ``max_postings`` doc_ids ascending, comma-joined.

    Scale shape: df counts are a plain map-side-combinable aggregate;
    the posting list is capped BEFORE collection by a rank window
    partitioned on the token, so a stopword's corpus-sized posting list
    never materializes anywhere — the collect_list only ever sees
    <= max_postings rows per token."""
    from pyspark.sql import Window

    toks = df.select("doc_id",
                     F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("tok").orderBy("doc_id")
    capped = (toks.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= max_postings))
    postings = (capped.groupBy("tok")
                .agg(F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
                     .alias("postings")))
    return dfreq.join(postings, "tok").select("tok", "df", "postings")


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard cleaning-normalization column: lowercase, strip
    punctuation, collapse runs of whitespace, trim. Pure column
    expressions (whole-stage codegen) — the canonical pre-dedup
    normalization so near-identical documents hash identically."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[.,!?;:'\"()\[\]{}]", ""),
        r"\s+", " "))
    return df.withColumn("text_norm", norm)


def lm_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-unigram language-model score per document: the mean
    log-probability of the document's tokens under the corpus unigram
    distribution, avg_i ln(count(tok_i) / total_tokens) — the cheap
    stand-in for CCNet-style LM-perplexity quality filtering (documents
    made of globally-rare tokens score low; stopword soup scores high).

    Two map-side-combinable aggregates (corpus token counts, per-doc
    join + avg); the token-keyed join shuffles the exploded token
    stream once — same shape and cost as TF-IDF. Adds ``lm_logprob``
    (rounded) and keeps ``n_tokens``.
    """
    from golem_spark.pipeline._cache import _swap_cache

    toks = df.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    # the exploded token frame feeds the vocabulary count, the total,
    # and the join back — persist it so the corpus tokenizes once
    toks = _swap_cache("lm_score_toks", toks)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.count()
    scored = (toks.join(counts, "tok")
              .groupBy("doc_id")
              .agg(F.round(F.avg(F.log(F.col("cnt").cast("double")
                                       / F.lit(float(total)))), 6)
                   .alias("lm_logprob"),
                   F.count(F.lit(1)).alias("n_tokens")))
    return scored


def chunk_tokens(df: DataFrame, chunk_size: int = 32, overlap: int = 8,
                 text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the retrieval/context-window chunking operator (stride =
    chunk_size - overlap; the final partial window is kept).

    Output: (doc_id, chunk_id, chunk_tokens, chunk_hash). Pure per-row
    array expressions (sequence + slice inside whole-stage codegen):
    zero shuffle, scales linearly, and the explode multiplies rows by
    ~n_tokens/stride — bounded and predictable.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    # number of windows starting at 1, 1+stride, ... that still contain
    # at least one NEW token: ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)).cast("double")
                      / F.lit(float(stride))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(toks, i * stride + 1, chunk_size).alias("ctoks")))
    out = (df.select("doc_id", F.explode(chunks).alias("c"))
           .select("doc_id",
                   F.col("c.chunk_id").alias("chunk_id"),
                   F.size("c.ctoks").cast("long").alias("chunk_tokens"),
                   F.md5(F.array_join("c.ctoks", " ")).alias("chunk_hash")))
    return out


def vocab_coverage(df: DataFrame, top_k: int = 100,
                   text_col: str = "text") -> DataFrame:
    """Zipf coverage curve: the cumulative fraction of all corpus token
    occurrences covered by the ``top_k`` most frequent tokens — the
    standard vocabulary-sizing diagnostic before committing a tokenizer
    vocab.

    Plan shape: one combinable token-count groupBy (map-side partials),
    a TakeOrdered top-k (k rows per partition cross the shuffle), and a
    1-row total broadcast. The cumulative window runs over the k-row
    result only — driver-sized, so the unpartitioned window is safe by
    construction, never over the corpus.

    Returns (rank, tok, cnt, cum_frac) with deterministic
    (cnt desc, tok asc) ordering.
    """
    from pyspark.sql import Window

    toks = df.select(F.explode(tokens_col(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    order = [F.desc("cnt"), F.asc("tok")]
    top = counts.orderBy(*order).limit(top_k)
    w_rank = Window.orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    return (top
            .withColumn("rank", F.row_number().over(w_rank))
            .withColumn("cum_cnt", F.sum("cnt").over(w_cum))
            .crossJoin(F.broadcast(total))
            .select("rank", "tok", "cnt",
                    F.round(F.col("cum_cnt") / F.col("total"), 6)
                    .alias("cum_frac")))


def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k_smooth: float = 0.5) -> DataFrame:
    """Corpus bigram language-model score per document (the CCNet-style
    quality signal one level up from the unigram ``lm_score``): train
    add-k-smoothed bigram probabilities P(w2|w1) on the corpus itself,
    then score each document by its mean bigram log-probability.

    Plan shape: ordered bigrams come from one array-transform pass (no
    window, no self-join); bigram/unigram count tables are combinable
    groupBys, vocabulary-sized, and broadcast back onto the exploded
    bigrams — the corpus is never shuffled on a data-sized key.

    Returns (doc_id, n_bigrams, avg_logp).
    """
    toks = tokens_col(text_col)
    # zip the array with its own shift — one pass over the token array
    # (an index-generate + element_at form re-evaluates the split per
    # element and measured ~10x slower at sf0.1)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    eb = df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
    eb = eb.withColumn("w1", F.split(F.col("bigram"), " ")[0])
    big_counts = eb.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    uni = (df.select(F.explode(toks).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c1")))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (eb
              .join(F.broadcast(big_counts), "bigram")
              .join(F.broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
              .crossJoin(F.broadcast(vocab))
              .withColumn("logp",
                          F.log((F.col("c12") + F.lit(float(k_smooth)))
                                / (F.col("c1")
                                   + F.lit(float(k_smooth)) * F.col("v")))))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.round(F.avg("logp"), 6).alias("avg_logp")))


def group_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score standardization (sample sd) — the group-wise
    analogue of the GLM preprocessing standardizer, as a pipeline
    column op. One shuffle on the group key. Adds ``z``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col)
    mu = F.avg(F.col(value_col)).over(w)
    sd = F.stddev_samp(F.col(value_col)).over(w)
    return df.withColumn(
        "z", F.when(sd > 0, (F.col(value_col) - mu) / sd).otherwise(F.lit(0.0)))


def sparse_cosine_pairs(df: DataFrame, threshold: float = 0.5,
                        max_df_frac: float = 0.5,
                        text_col: str = "text") -> DataFrame:
    """All-pairs TF-IDF cosine similarity via an inverted-index join —
    the sparse-vector analogue of the embedding near-dup pass.

    Weight = tf * (ln((N+1)/(df+1)) + 1) (same smoothed idf as
    tfidf_vectors). Terms with document frequency above
    ``max_df_frac * N`` are pruned BEFORE the self-join: posting-list
    length is what makes a term-keyed join quadratic, and near-stopword
    terms carry ~zero idf weight anyway — this is the cap that keeps
    the join's per-key fan-out bounded at corpus scale (cosines are
    computed over the pruned vocabulary, both sides consistently).

    Plan shape: tf/df are combinable groupBys; the candidate join is
    keyed on the term; per-pair dot products are one groupBy on
    (doc_a, doc_b). Returns (doc_a, doc_b, cos) for pairs with
    cos >= threshold (threshold applied to the unrounded cosine,
    emitted rounded to 6).
    """
    from golem_spark.pipeline._cache import _swap_cache

    toks = df.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    # tf is read by the df aggregate AND the cells build; cells is read
    # by norms and both sides of the term-keyed self-join — persist
    # both slim frames so the corpus explode + (doc, tok) shuffle run
    # once instead of once per downstream consumer (4x before)
    tf = _swap_cache(
        "cospairs_tf",
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    kept = dfreq.filter(F.col("df") <= float(max_df_frac) * n_docs)
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 1.0)) + 1.0
    cells = _swap_cache(
        "cospairs_cells",
        tf.join(F.broadcast(kept), "tok")
        .select("doc_id", "tok", (F.col("tf") * idf).alias("w")))
    norms = (cells.groupBy("doc_id")
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    a = cells.select(F.col("doc_id").alias("doc_a"), "tok",
                     F.col("w").alias("wa"))
    b = cells.select(F.col("doc_id").alias("doc_b"), "tok",
                     F.col("w").alias("wb"))
    dots = (a.join(b, "tok")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (dots.join(F.broadcast(na), "doc_a").join(F.broadcast(nb), "doc_b")
            .filter(cos >= threshold)
            .select("doc_a", "doc_b", F.round(cos, 6).alias("cos")))


def token_entropy(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (nats) of each document's token distribution —
    low entropy flags repetitive/templated text (the same signal family
    as repetition_stats, information-theoretic form).

    Plan shape: explode -> (doc, tok) count -> per-doc entropy agg. Two
    combinable groupBys on the SAME (doc-prefixed) key, so Catalyst
    reuses one shuffle partitioning for both; linear in document length
    (an aggregate-over-array form would be shuffle-free but O(unique x
    len) per row — wrong for long documents).

    Returns (id_col, n_tokens, entropy) with entropy rounded to 6.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col))
                     .alias("tok"))
    counts = toks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    return (counts.groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.round(
                     F.log(F.sum("c"))
                     - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                     6).alias("entropy")))


def bigram_pmi(df: DataFrame, top_k: int = 20, min_count: int = 5,
               text_col: str = "text") -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(w1,w2) = ln(c12 * N / (c1 * c2)) over adjacent token pairs, the
    standard phrase-mining signal (word2vec-style phrase joining).

    N = total bigram occurrences; unigram counts are taken over the
    same positions (first elements of bigrams plus each doc's last
    token) so marginals sum consistently. Counts are combinable
    groupBys; the ranking is a TakeOrdered top-k — nothing bigger than
    the vocabulary ever shuffles. ``min_count`` filters noise pairs
    (PMI of rare pairs is upward-biased).

    Returns (bigram, c12, c1, c2, pmi) ordered by (pmi desc, bigram).
    """
    toks = tokens_col(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    eb = df.select(F.explode(bigrams).alias("bigram"))
    bc = eb.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    uni = (df.select(F.explode(toks).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    total = eb.agg(F.count(F.lit(1)).cast("double").alias("n_big"))
    w1 = F.split(F.col("bigram"), " ")[0]
    w2 = F.split(F.col("bigram"), " ")[1]
    scored = (bc.filter(F.col("c12") >= min_count)
              .withColumn("w1", w1).withColumn("w2", w2)
              .join(F.broadcast(uni.select(F.col("tok").alias("w1"),
                                           F.col("c").alias("c1"))), "w1")
              .join(F.broadcast(uni.select(F.col("tok").alias("w2"),
                                           F.col("c").alias("c2"))), "w2")
              .crossJoin(F.broadcast(total))
              .select("bigram", "c12", "c1", "c2",
                      F.round(F.log(F.col("c12") * F.col("n_big")
                                    / (F.col("c1") * F.col("c2"))), 6)
                      .alias("pmi")))
    return scored.orderBy(F.desc("pmi"), "bigram").limit(top_k)


def pad_collate(df: DataFrame, max_len: int = 64, pad_tok: str = "<pad>",
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixed-length collation: truncate each document's token sequence
    to ``max_len`` and right-pad with ``pad_tok`` — the batch-collator
    layout (input_ids + attention mask) as pure per-row array
    expressions, zero shuffle, ready for `mapInArrow` hand-off to a
    training framework.

    Returns (id_col, n_real, ids_md5, mask_sum) where ids_md5
    fingerprints the padded sequence (space-joined) and mask_sum =
    number of real (unpadded) positions — the two invariants a collator
    bug breaks first.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    toks = tokens_col(text_col)
    n_real = F.least(F.size(toks), F.lit(max_len))
    truncated = F.slice(toks, 1, max_len)
    n_pad = F.lit(max_len) - n_real
    padded = F.concat(truncated,
                      F.array_repeat(F.lit(pad_tok), n_pad.cast("int")))
    mask = F.concat(F.array_repeat(F.lit(1), n_real.cast("int")),
                    F.array_repeat(F.lit(0), n_pad.cast("int")))
    return df.select(
        F.col(id_col),
        n_real.cast("long").alias("n_real"),
        F.md5(F.array_join(padded, " ")).alias("ids_md5"),
        F.aggregate(mask, F.lit(0), lambda a, x: a + x).cast("long")
        .alias("mask_sum"))


def bm25_score(df: DataFrame, query_tokens: list[str], k1: float = 1.2,
               b: float = 0.75, top_k: int = 10,
               text_col: str = "text") -> DataFrame:
    """Okapi BM25 document scoring for a fixed query token set — the
    classic lexical-retrieval ranking (the sparse half of a hybrid
    retrieval stack).

    idf = ln((N - df + 0.5)/(df + 0.5) + 1); tf saturation with length
    normalization b against the mean document length. The query side is
    a literal array, so scoring is: one tf groupBy restricted to query
    tokens (semi-join sized by the query, not the vocabulary), broadcast
    df/avglen scalars, combinable per-doc sum. Returns the top_k
    (doc_id, score) by (rounded score desc, doc_id).
    """
    if not query_tokens:
        raise ValueError("query_tokens must be non-empty")
    qarr = [F.lit(t) for t in query_tokens]
    toks = df.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    lens = df.select("doc_id",
                     F.size(tokens_col(text_col)).cast("double").alias("dl"))
    stats = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(tokens_col(text_col))).alias("avgdl"))
    qtf = (toks.filter(F.col("tok").isin(query_tokens))
           .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    qdf = qtf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tf_sat = (F.col("tf") * (k1 + 1)
              / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                     / F.col("avgdl"))))
    scored = (qtf.join(F.broadcast(qdf), "tok")
              .join(F.broadcast(lens), "doc_id")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.round(F.sum(idf * tf_sat), 6).alias("score")))
    return scored.orderBy(F.desc("score"), "doc_id").limit(top_k)


def rrf_fuse(rank_a: DataFrame, rank_b: DataFrame, k: int = 60,
             top_k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion of two rankings (Cormack et al. 2009):
    rrf(d) = sum over lists of 1/(k + rank_d). The standard way to
    combine lexical (BM25) and dense (embedding) retrieval without
    score calibration. Inputs must carry a ``rank`` column (1-based);
    docs absent from a list contribute nothing. Returns top_k
    (id, rrf) by (rounded rrf desc, id)."""
    a = rank_a.select(F.col(id_col),
                      (1.0 / (k + F.col("rank"))).alias("__c"))
    b = rank_b.select(F.col(id_col),
                      (1.0 / (k + F.col("rank"))).alias("__c"))
    return (a.unionByName(b)
            .groupBy(id_col)
            .agg(F.round(F.sum("__c"), 6).alias("rrf"))
            .orderBy(F.desc("rrf"), id_col)
            .limit(top_k))


def fuzzy_vocab_pairs(df: DataFrame, text_col: str, max_dist: int = 1,
                      split_char: str = " ") -> DataFrame:
    """Edit-distance-1 vocabulary pairs via the SymSpell deletion
    neighborhood: every word generates its 1-deletion variants; two
    words within edit distance 1 necessarily SHARE a variant, so the
    candidate join is keyed on the variant string (vocabulary-sized
    buckets) instead of an all-pairs cross product — then exact
    levenshtein verifies. The standard typo-normalization /
    vocab-merging pass; at corpus scale the deletion index is what
    makes fuzzy joins linear.

    Returns (word_a, word_b, dist) for verified pairs, word_a < word_b.
    """
    words = (df.select(F.explode(F.split(F.col(text_col), split_char))
                       .alias("word"))
             .filter(F.length("word") > 0).distinct())
    dels = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.concat(F.col("word").substr(F.lit(1), i - 1),
                           F.col("word").substr(i + 1, F.length("word"))))
    variants = F.array_union(F.array(F.col("word")), dels)
    idx = words.select("word", F.explode(variants).alias("variant"))
    a = idx.select(F.col("word").alias("word_a"), "variant")
    b = idx.select(F.col("word").alias("word_b"), "variant")
    cand = (a.join(b, "variant")
            .filter(F.col("word_a") < F.col("word_b"))
            .select("word_a", "word_b").distinct())
    dist = F.levenshtein(F.col("word_a"), F.col("word_b"))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .orderBy("word_a", "word_b"))


def token_budget_pack(df: DataFrame, budget: int, count_col: str = "n_chars",
                      group_col: str = "source",
                      order_col: str = "doc_id") -> DataFrame:
    """Per-group token-budget curation: lay documents out in
    ``order_col`` order within each group and keep those whose
    EXCLUSIVE prefix sum of ``count_col`` is still under ``budget`` —
    the standard per-domain token-cap step of a pretraining mix.

    Scale shape: one partitioned window per group (groups are domains /
    sources — thousands of parallel partitions, never a global sort);
    emits the running total so downstream mixing can re-weight without
    recounting."""
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum_before = F.sum(F.col(count_col)).over(w) - F.col(count_col)
    return (df
            .withColumn("cum_before", cum_before.cast("long"))
            .withColumn("kept", (F.col("cum_before") < F.lit(budget))
                        .cast("int")))


def corpus_mix_report(df: DataFrame, count_col: str = "n_chars") -> DataFrame:
    """Data-card mix report: per (source, lang) document counts, token
    mass, and share of the total corpus — the table every training-mix
    decision starts from. One combinable groupBy plus a broadcast of
    the single global total."""
    per = (df.groupBy("source", "lang")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.col(count_col)).cast("long").alias("mass")))
    total = per.agg(F.sum("mass").alias("__tot"))
    return (per.crossJoin(F.broadcast(total))
            .select("source", "lang", "n_docs", "mass",
                    F.round(F.col("mass").cast("double")
                            / F.col("__tot").cast("double"), 6)
                    .alias("share")))


def unigram_kl(df: DataFrame, source_a: str, source_b: str,
               k_smooth: float = 0.5, text_col: str = "text") -> DataFrame:
    """Token-distribution drift between two sources: symmetric KL
    divergence of add-k-smoothed unigram distributions — the signal for
    'did this source's content shift' in a corpus refresh.

    Scale shape: two combinable token-count groupBys over the union
    vocabulary (full-outer joined), one smoothing pass, k-row driver
    result. No per-document work survives the first groupBy."""
    toks = (df.filter(F.col("source").isin([source_a, source_b]))
            .select("source", F.explode(tokens_col(text_col)).alias("tok")))
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cnt"))
    return unigram_kl_from_counts(counts, source_a, source_b,
                                  k_smooth=k_smooth)


def unigram_kl_from_counts(counts: DataFrame, source_a: str, source_b: str,
                           k_smooth: float = 0.5) -> DataFrame:
    """The KL math of :func:`unigram_kl` over a pre-aggregated
    (source, tok, cnt) frame — shared by the batch query and the
    streaming drift monitor (streaming/monitors.py), so stream==batch
    equality is by construction of the same expressions."""
    a = (counts.filter(F.col("source") == source_a)
         .select("tok", F.col("cnt").alias("ca")))
    b = (counts.filter(F.col("source") == source_b)
         .select("tok", F.col("cnt").alias("cb")))
    joined = (a.join(b, "tok", "full_outer")
              .select("tok",
                      F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
                      F.coalesce(F.col("cb"), F.lit(0)).alias("cb")))
    tot = joined.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"),
                     F.count(F.lit(1)).alias("v"))
    sm = (joined.crossJoin(F.broadcast(tot))
          .select("tok", "ca", "cb",
                  ((F.col("ca") + F.lit(k_smooth))
                   / (F.col("ta") + F.lit(k_smooth) * F.col("v")))
                  .alias("pa"),
                  ((F.col("cb") + F.lit(k_smooth))
                   / (F.col("tb") + F.lit(k_smooth) * F.col("v")))
                  .alias("pb")))
    return sm.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.round(F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb"))),
                6).alias("kl_ab"),
        F.round(F.sum(F.col("pb") * F.log(F.col("pb") / F.col("pa"))),
                6).alias("kl_ba"))


# -- PII scrubbing ----------------------------------------------------------

# Patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically: character classes, bounded repetition, \b, \d —
# no lookaround. Order matters: emails before phones (an email's digits
# must not be half-redacted), SSN before phone (3-2-4 vs 3-3-4 digit
# shapes), IPs last (their octets never match the stricter shapes above).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # \b can't anchor before an optional "(" (it is a non-word char), so
    # the parenthesized area code is an explicit alternation branch
    ("phone", r"(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass (the Dolma/CCNet-style scrub step every
    published-corpus pipeline runs before release): replace emails,
    SSNs, US-style phone numbers and IPv4 addresses with typed
    placeholder tokens, and report per-document match counts per
    category.

    Pure per-row regexp column expressions — embarrassingly parallel,
    zero shuffle, linear in corpus bytes; exactly the map-only shape a
    100 TB scrub needs. Counts are taken BEFORE redaction (each
    category counts matches in the original text, so categories don't
    consume each other's counts), redaction applies the patterns in
    PII_PATTERNS order. Output: (doc_id, n_<category>..., text_scrubbed).
    """
    counts = [F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select("doc_id", *counts, scrubbed.alias("text_scrubbed"))


# -- deterministic corpus mixing --------------------------------------------


def mix_corpus(df: DataFrame, weights: dict[str, int],
               text_col: str = "text",
               source_col: str = "source") -> DataFrame:
    """Deterministic data mixing: downsample sources so the kept corpus
    matches target mixture ``weights`` (integer percents per source) —
    the step that turns N crawls/dumps into ONE pretraining mix with a
    declared data card.

    Math (all integer, so both engines agree exactly): with mass_s =
    total tokens of source s, the largest achievable mixed-corpus size
    is T = min_s floor(100 * mass_s / w_s) (the binding source keeps
    everything); each source's target is floor(w_s * T / 100) tokens,
    implemented as a deterministic md5 keep rule (hash(doc_id) % 1e6 <
    rate_ppm with rate_ppm = floor(1e6 * w_s * T / (100 * mass_s))) —
    reproducible across runs, engines and partitionings, unlike
    df.sample. Doc-level Bernoulli keeps token mass near target
    (sampling noise reported, not hidden): output one row per weighted
    source with (rate_ppm, target_tokens, kept docs/tokens, mass).

    Scale shape: ONE token-count scan + a |sources|-row aggregate
    (broadcast back as literals via the plan), then a map-side keep
    filter and a second combinable aggregate. No data-keyed shuffle of
    the corpus itself.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers per source")
    wmap = F.create_map(*[F.lit(x) for kv in sorted(weights.items())
                          for x in kv])
    toks = df.filter(F.col(source_col).isin(list(weights)))\
             .select(F.col("doc_id"), F.col(source_col).alias("source"),
                     F.size(tokens_col(text_col)).cast("long").alias("n_tok"))
    mass = (toks.groupBy("source")
            .agg(F.sum("n_tok").alias("mass"),
                 F.count(F.lit(1)).alias("n_docs"))
            .withColumn("w", wmap[F.col("source")].cast("long")))
    # T = min_s (100*mass_s div w_s): a |sources|-row agg, broadcast on.
    # All divisions are INTEGER div (not floor(double)) so the ppm rates
    # stay exact past 2^53 token masses — both engines floor-divide.
    # floor(1e6*target/mass) is computed as two chained div/mod steps of
    # 1000x each, keeping every intermediate below 1000*mass — no int64
    # overflow even at 10^13+ tokens per source (1e6*target would wrap).
    t_frame = mass.agg(F.min(F.expr("(100 * mass) div w"))
                       .cast("long").alias("t"))
    rated = (mass.crossJoin(F.broadcast(t_frame))
             .withColumn("target_tokens",
                         F.expr("(w * t) div 100").cast("long"))
             .withColumn("rate_ppm",
                         F.least(
                             F.lit(1000000).cast("long"),
                             F.expr("((1000 * target_tokens) div mass) "
                                    "* 1000 + (1000 * pmod(1000 * "
                                    "target_tokens, mass)) div mass")
                             .cast("long"))))
    keep = (toks.join(F.broadcast(rated.select("source", "rate_ppm")),
                      "source")
            .filter(_md5_int(F.concat_ws("_", F.col("doc_id").cast("string"),
                                         F.lit("mix"))) % 1000000
                    < F.col("rate_ppm"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("kept_docs"),
                 F.sum("n_tok").alias("kept_tokens")))
    return (rated.join(keep, "source", "left")
            .select("source", "w", "mass", "n_docs", "rate_ppm",
                    "target_tokens",
                    F.coalesce("kept_docs", F.lit(0)).cast("long")
                    .alias("kept_docs"),
                    F.coalesce("kept_tokens", F.lit(0)).cast("long")
                    .alias("kept_tokens")))


# -- BPE merge learning ------------------------------------------------------


def _apply_merge(syms, s1: str, s2: str):
    """Left-to-right greedy non-overlapping merge of adjacent (s1, s2)
    in a symbol array — the classic BPE merge step ('a a a a a' with
    (a,a) -> 'aa aa a') as a single F.aggregate fold: state = (emitted
    symbols, one pending symbol); a pending s1 followed by s2 emits the
    merged symbol and clears, else the pending symbol flushes."""
    merged = s1 + s2
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit("").alias("prev"))

    def step(acc, x):
        return (F.when(acc["prev"] == "",
                       F.struct(acc["out"].alias("out"), x.alias("prev")))
                .when((acc["prev"] == s1) & (x == s2),
                      F.struct(F.concat(acc["out"],
                                        F.array(F.lit(merged))).alias("out"),
                               F.lit("").alias("prev")))
                .otherwise(F.struct(F.concat(acc["out"],
                                             F.array(acc["prev"])).alias("out"),
                                    x.alias("prev"))))

    def fin(acc):
        return F.when(acc["prev"] == "", acc["out"]) \
                .otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(syms, init, step, fin)


def _merge_word(syms: list, rules: list) -> list:
    """Apply ``rules`` = [(s1, s2, merged), ...] to one symbol list in
    order, each as the greedy left-to-right non-overlapping merge —
    the pure-Python twin of :func:`_apply_merge` (property-tested equal
    in tests/test_pipeline.py)."""
    for s1, s2, merged in rules:
        if s1 not in syms or s2 not in syms:
            continue
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == s1 and syms[i + 1] == s2:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _rewrite_seqs(seqs: DataFrame, batch: list) -> DataFrame:
    """Rewrite every word's symbol sequence with this round's committed
    merges — one Arrow-batched map-only pass over the vocab-sized word
    table (``batch`` is driver-side, a handful of string pairs)."""
    rules = [(s1, s2, s1 + s2) for s1, s2 in batch]

    def rewrite(it):
        for pdf in it:
            pdf["syms"] = [_merge_word(list(s), rules) for s in pdf["syms"]]
            yield pdf

    return seqs.mapInPandas(rewrite, seqs.schema)


def _materialize(slot: str, df: DataFrame) -> DataFrame:
    """Eager localCheckpoint + slot registration for iterative
    snapshots. TRUNCATING the lineage (not just persisting) is the
    point: the learner's word table chains one rewrite per round, and
    without truncation Catalyst re-analyzes the whole merge history
    every round — measured superlinear blowup (114 s/round by round 13
    at sf0.001) with plain persist. Checkpoint blocks of dropped
    rounds are reclaimed by Spark's ContextCleaner once unreferenced
    (same lifecycle note as dedup.dup_components); the slot keeps at
    most one snapshot reachable across calls. On a cluster with
    executor churn substitute reliable checkpoint(dir) — same shape."""
    from golem_spark.pipeline._cache import _adopt_cache

    return _adopt_cache(slot, df.localCheckpoint(eager=True))


def bpe_merges(df: DataFrame, n_merges: int = 4,
               text_col: str = "text", max_batch: int = 64,
               band: float | None = None,
               _stats: dict | None = None) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus —
    distributed byte-pair-encoding tokenizer training (Sennrich et al.
    2016), the vocabulary-construction step of every LLM data pipeline.

    Classic algorithm on the WORD-FREQUENCY table (so all work after
    the first scan is vocab-sized, never corpus-sized), with a BATCHED
    driver loop that stays EXACTLY greedy-equivalent: each round counts
    adjacent symbol pairs once (one combinable explode+groupBy), then
    commits the longest prefix of the (count DESC, s1, s2)-sorted pair
    list that sequential greedy provably would have picked unchanged:

    * prefix pairs must be pairwise symbol-disjoint (incl. each merged
      token) — a merge only destroys/creates adjacencies touching its
      own symbols, so disjoint pairs keep their exact counts;
    * each merged token must be a FRESH symbol (no left- or right-
      neighbor pairs anywhere in the current table) — otherwise a
      pre-existing symbol of the same string gains occurrences and
      neighbor bounds compound across commits;
    * each later pair's count must STRICTLY exceed every earlier
      commit's new-pair bound ``max(maxL(s1), maxR(s2))``, where
      maxL/maxR are the highest left-/right-neighbor pair counts in
      the full table: every pair a merge creates pairs its token with
      a left neighbor of ``s1`` or a right neighbor of ``s2`` (by
      induction through earlier fresh merged tokens), so nothing it
      spawns can overtake (or tie with) the rest of the prefix.

    The commit walk stops at the first violation, so the worst case
    degrades to the classic one-merge-per-round loop; elsewhere rounds
    commit several merges, making driver rounds (and Spark jobs)
    sublinear in ``n_merges`` — the property real tokenizer training
    (~30k merges) needs. (Merge CHAINS that assemble one frequent word
    symbol-by-symbol are inherently sequential under exact greedy
    semantics — no batch can contain two links of a chain.) Per round:
    one vocab-sized pair-count job, one triple-bound job (skipped when
    the prefix is a single pair), and one Arrow-batched rewrite of the
    lineage-truncated word table.

    ``band``: None (default) keeps the EXACT greedy contract above —
    the mode every oracle certifies. A float delta in [0, 1) switches
    to documented APPROXIMATE frequency-band batching (what production
    tokenizer trainers do when exact merge order stops mattering):
    each round commits the whole symbol-disjoint prefix whose counts
    are >= (1-delta) * the round's top count, SKIPPING the created-
    pair triple-bound job and its strict-dominance cut. The
    approximation is bounded, not loose (property-tested):

    * every committed pair's count is a TRUE round-start count (the
      disjointness rule is kept, so counts are exact under the batch)
      within (1-delta) of the round's maximum — a merge can only be
      "early" by pairs whose frequency is within the band;
    * rounds' top counts are monotone non-increasing (a created pair
      never exceeds the count of the merge that created it), so the
      band threshold also never rises — merges committed out of exact
      order still arrive in band order;
    * delta=0 commits exact count-ties only.

    Merge chains no longer serialize rounds under band mode: deep
    vocabularies train in O(n_merges / band_width) rounds instead of
    O(n_merges). Exactness stays the default and the cross-engine
    oracle contract.

    Words are restricted to ``[A-Za-z0-9]+`` (the encode fold's state
    encoding and the oracle's sentinel characters require symbols free
    of whitespace and '|'). Returns (step, lhs, rhs, pair_count) — the
    merge table a tokenizer would persist. ``_stats`` (tests) receives
    {"rounds", "merges", "round_log": [{"c_max", "committed"}]}.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if band is not None and not 0.0 <= band < 1.0:
        raise ValueError("band must be None (exact) or a float in [0, 1)")
    words = (df.select(F.explode(tokens_col(text_col)).alias("w"))
             .filter(F.col("w").rlike("^[A-Za-z0-9]+$"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    seqs = _materialize(
        "bpe_seqs",
        words.select("cnt", F.split(F.regexp_replace(F.col("w"), "(.)",
                                                     "$1 "),
                                    " ", -1).alias("syms"))
        .select("cnt", F.slice("syms", 1, F.size("syms") - 1).alias("syms")))
    # driver-side symbol vocabulary: every merged token ever committed
    # — an over-approximate membership test for "would this merged
    # token collide with an existing symbol" that replaces a per-round
    # Spark job. The INITIAL symbols need no Spark collect at all: they
    # are single characters (the char-split above), and a merged token
    # is always >= 2 chars (s1+s2, each a non-empty symbol), so
    # membership against the initial alphabet can never fire — only
    # tokens added by the loop below can collide. At most n_merges
    # strings.
    vocab_syms: set = set()
    rules: list = []
    rounds = 0
    sep = "|"  # symbols are alnum, so '|' never occurs inside one
    while len(rules) < n_merges:
        budget = min(max_batch, n_merges - len(rules))
        pairs = (seqs.select(
            "cnt",
            F.explode(F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("s1"), b.alias("s2"))))
            .alias("p"))
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("cnt").alias("n")))
        top = (pairs.orderBy(F.desc("n"), "s1", "s2")
               .limit(max(2 * budget, 8)).collect())
        if not top:
            break
        rounds += 1
        # candidate prefix by symbol-disjointness alone (driver-side,
        # free), cut at the first merged token that collides with an
        # existing symbol (committing THAT one is still greedy's pick,
        # but it boosts existing pairs, so it must end the prefix) —
        # if only the top pair survives, the round degrades to the
        # classic loop with no extra jobs
        pref: list = []
        touched: set = set()
        for r in top:
            s1, s2, n = r["s1"], r["s2"], int(r["n"])
            merged = s1 + s2
            if pref and (s1 in touched or s2 in touched
                         or merged in touched):
                break
            pref.append((s1, s2, n, merged))
            touched |= {s1, s2, merged}
            if len(pref) >= budget or merged in vocab_syms:
                break
        if band is not None:
            # frequency-band batching: the disjoint prefix within
            # (1-band) of the top count commits wholesale — no
            # triple-bound job, bounded (not exact) merge order
            thr = (1.0 - band) * pref[0][2]
            committed = [(s1, s2, n) for s1, s2, n, _ in pref if n >= thr]
        elif len(pref) == 1:
            committed = [pref[0][:3]]
        else:
            # EXACT created-pair bounds: every pair a merge (a,b)->m
            # spawns maps 1:1 onto a round-start triple (z,a,b) or
            # (a,b,y) (induction through fresh merged tokens: a later
            # m_k neighbor contributes its b_k/a_k as z/y), so the max
            # triple count is a sound cap on anything the merge can
            # create — far tighter than the max neighbor-pair count.
            # One vocab-sized job: triples touching a candidate pair,
            # exploded to (side, pair) keys, max count per key.
            keys = [p[0] + sep + p[1] for p in pref]
            a = F.slice("syms", 1, F.size("syms") - 2)
            b = F.slice("syms", 2, F.size("syms") - 2)
            c = F.slice("syms", 3, F.size("syms") - 2)
            lkey, rkey = (F.concat_ws(sep, "y", "z"),
                          F.concat_ws(sep, "x", "y"))
            bound_rows = (seqs.filter(F.size("syms") >= 3)
                          .select("cnt", F.explode(F.arrays_zip(
                              a.alias("x"), b.alias("y"), c.alias("z")))
                              .alias("t"))
                          .select("cnt", "t.x", "t.y", "t.z")
                          .filter(lkey.isin(keys) | rkey.isin(keys))
                          .groupBy("x", "y", "z")
                          .agg(F.sum("cnt").alias("n"))
                          .select("n", F.explode(F.array(
                              F.struct(F.lit("L").alias("side"),
                                       lkey.alias("k")),
                              F.struct(F.lit("R").alias("side"),
                                       rkey.alias("k")))).alias("s"))
                          .filter(F.col("s.k").isin(keys))
                          .groupBy("s.side", "s.k")
                          .agg(F.max("n").alias("m")).collect())
            bound = {(r["side"], r["k"]): int(r["m"]) for r in bound_rows}
            committed, cap = [], -1
            for s1, s2, n, merged in pref:
                if committed and n <= cap:
                    break
                committed.append((s1, s2, n))
                k = s1 + sep + s2
                cap = max(cap, bound.get(("L", k), 0),
                          bound.get(("R", k), 0))
        if _stats is not None:
            _stats.setdefault("round_log", []).append(
                {"c_max": int(top[0]["n"]),
                 "committed": [int(n) for _, _, n in committed]})
        for s1, s2, n in committed:
            rules.append((len(rules) + 1, s1, s2, n))
            vocab_syms.add(s1 + s2)
        if len(rules) < n_merges:
            seqs = _materialize("bpe_seqs", _rewrite_seqs(
                seqs, [(s1, s2) for s1, s2, _ in committed]))
    if _stats is not None:
        _stats.update({"rounds": rounds, "merges": len(rules)})
    return df.sparkSession.createDataFrame(
        rules, "step int, lhs string, rhs string, pair_count long")


def bpe_merge_log(df: DataFrame, n_merges: int = 8, band: float = 0.1,
                  text_col: str = "text",
                  max_batch: int = 64) -> DataFrame:
    """Band-mode BPE training with the per-round audit LOG exposed as
    the result: one row per committed merge, carrying its round index
    and the round-start maximum pair count — the evidence behind the
    bounded-approximation contract of :func:`bpe_merges(band=...)`
    (VERDICT r10 item 3). From these rows the band invariants are
    directly checkable (and the cross-engine oracle re-derives every
    value by replaying the banded rounds in SQL): round maxima are
    monotone non-increasing, every pair_count is a TRUE round-start
    count >= (1-band) * its round's c_max, and steps arrive in
    band order.

    Output (step, round, c_max, lhs, rhs, pair_count) ordered by step.
    """
    stats: dict = {}
    rules_df = bpe_merges(df, n_merges=n_merges, text_col=text_col,
                          max_batch=max_batch, band=band, _stats=stats)
    rules = rules_df.collect()  # driver-built frame; model-sized
    rows, i = [], 0
    for rnd, log in enumerate(stats.get("round_log", []), start=1):
        for _n in log["committed"]:
            r = rules[i]
            rows.append((int(r["step"]), rnd, int(log["c_max"]),
                         r["lhs"], r["rhs"], int(r["pair_count"])))
            i += 1
    return df.sparkSession.createDataFrame(
        rows, "step int, round int, c_max long, lhs string, rhs string, "
              "pair_count long").orderBy("step")


def bpe_encode(df: DataFrame, n_merges: int = 4,
               text_col: str = "text",
               rules: "list[tuple[str, str]] | None" = None) -> DataFrame:
    """Tokenize the corpus with freshly-learned BPE merges — the
    encode half of the tokenizer story (:func:`bpe_merges` is the
    learn half): apply the ``n_merges`` learned rules IN LEARNED ORDER
    to every word, one greedy left-to-right fold per rule. Applying
    rules once each in priority order is the standard fast BPE encode:
    a rule's sides exist only after earlier merges, so a later merge
    can never re-enable an earlier rule.

    Scale shape: rules are learned once (vocab-sized, see bpe_merges),
    then the fold chain runs over the DISTINCT word table (vocab-sized,
    map-only) and documents join back to that word->subword-count map —
    the corpus itself is scanned twice (word extraction + join-back
    aggregate), never folded per occurrence. Returns per-document
    (n_words, n_subwords, n_chars, chars_per_subword) — the
    compression-ratio profile a tokenizer report shows.

    ``rules``: precomputed ``[(lhs, rhs), ...]`` merge list in priority
    order — the production shape (learn ONCE on a training corpus,
    possibly with ``bpe_merges(band=...)``, encode many corpora with
    the persisted table); ``n_merges`` is ignored when given. Default
    None learns the rules from ``df`` itself.
    """
    from golem_spark.pipeline._cache import _swap_cache

    if rules is None:
        rules = [(r["lhs"], r["rhs"]) for r in
                 bpe_merges(df, n_merges, text_col).collect()]
    else:
        rules = [(str(a), str(b)) for a, b in rules]
    # docw feeds the vocab distinct AND the final join-back aggregate —
    # persist the slim (doc_id, w) frame so the corpus explode runs
    # once, not twice
    docw = _swap_cache(
        "bpe_docw",
        df.select("doc_id", F.explode(tokens_col(text_col)).alias("w"))
        .filter(F.col("w").rlike("^[A-Za-z0-9]+$")))
    vocab = docw.select("w").distinct()
    if len(rules) <= 16:
        # whole-stage-codegen fold chain (one F.aggregate per rule)
        syms = F.split(F.regexp_replace(F.col("w"), "(.)", "$1 "), " ", -1)
        syms = F.slice(syms, 1, F.size(syms) - 1)
        for lhs, rhs in rules:
            syms = _apply_merge(syms, lhs, rhs)
        enc_df = vocab.select(
            "w", F.size(syms).cast("long").alias("n_sub"),
            F.length("w").cast("long").alias("n_chars"))
    else:
        # long rule lists would nest hundreds of codegen folds; apply
        # them Arrow-batched over the vocab-sized word table instead
        # (same greedy-LTR semantics via _merge_word)
        full = [(s1, s2, s1 + s2) for s1, s2 in rules]

        def encode(it):
            import pandas as pd
            for pdf in it:
                ws = pdf["w"]
                yield pd.DataFrame({
                    "w": ws,
                    "n_sub": [len(_merge_word(list(w), full)) for w in ws],
                    "n_chars": [len(w) for w in ws]})

        enc_df = vocab.mapInPandas(
            encode, "w string, n_sub long, n_chars long")
    enc = _swap_cache("bpe_enc", enc_df)
    return (docw.join(enc, "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_subwords"),
                 F.sum("n_chars").alias("n_chars"))
            .select("doc_id", "n_words", "n_subwords", "n_chars",
                    F.round(F.col("n_chars").cast("double")
                            / F.col("n_subwords"), 6)
                    .alias("chars_per_subword")))


def winnow_fingerprints(df: DataFrame, k: int = 3, w: int = 4,
                        text_col: str = "text",
                        return_set: bool = False) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    w-gram window, keep each window's minimum hash; the selected set is
    a position-robust fingerprint with guaranteed detection of matches
    longer than w+k-1 tokens. Deviation from the paper noted: ties pick
    the LEFTMOST minimum (md5 ties are ~2^-60, and leftmost is what
    both engines' min-scan gives deterministically); the fingerprint
    set dedupes by hash VALUE.

    Pure per-row array expressions (the window scan is O(n_grams * w)
    per document, corpus-parallel, zero shuffle). Documents with fewer
    than k tokens have no fingerprints and are omitted. Returns
    (doc_id, n_grams, n_windows, n_selected, fp_checksum) where
    fp_checksum = sum of selected hashes mod 2^31-1; ``return_set``
    adds the sorted selected-hash array itself (``fps``) for
    overlap joins."""
    m = 2147483647
    toks = tokens_col(text_col)
    base = df.filter(F.size(toks) >= k)
    n_grams = F.size(toks) - (k - 1)
    # elementwise zip_with concat over shifted slices instead of a
    # slice+array_join per gram position (same 4x-measured rewrite as
    # dedup._ngrams_concat; position-exact identical output)
    grams = F.slice(toks, 1, n_grams)
    for j in range(1, k):
        grams = F.zip_with(grams, F.slice(toks, j + 1, n_grams),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    h = F.transform(grams, _md5_int)
    n_win = F.greatest(n_grams - (w - 1), F.lit(1))
    mins = F.transform(F.sequence(F.lit(1), n_win),
                       lambda j: F.array_min(F.slice(h, j, w)))
    sel = F.array_distinct(mins)
    checksum = F.aggregate(sel, F.lit(0).cast("long"),
                           lambda acc, x: acc + (x % F.lit(m))) % F.lit(m)
    out = base.select(
        "doc_id", n_grams.cast("long").alias("n_grams"),
        n_win.cast("long").alias("n_windows"),
        F.size(sel).cast("long").alias("n_selected"),
        checksum.alias("fp_checksum"),
        F.array_sort(sel).alias("fps"))
    return out if return_set else out.drop("fps")


# -- DSIR importance weighting ----------------------------------------------


def dsir_weights(df: DataFrame, target_source: str = "src0",
                 n_buckets: int = 64, k_smooth: float = 0.5,
                 text_col: str = "text") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    NeurIPS'23): score every document by how target-like its hashed
    unigram distribution is. Fit add-k-smoothed bag-of-hashed-tokens
    models on the target source vs the rest of the corpus, then weight
    each document by sum_tokens log(p_target(h(w)) / p_raw(h(w))) —
    the importance log-weight used to resample a raw corpus toward a
    high-quality target distribution.

    Scale shape: ONE combinable (bucket, is_target) token-count
    groupBy over the corpus (key space <= 2*n_buckets, bounded by
    construction — hashed features are the point of DSIR); the
    per-bucket log-ratio table collapses to a single broadcast one-row
    map literal; per-document scoring is then a pure array fold over
    the token column — zero corpus shuffle, no per-doc explode
    surviving past the map side. Log-ratios are 6-dp micro-ints so the
    per-doc sum is an order-independent exact integer.

    Output (doc_id, source, n_toks, logw, target_like) — logw the
    log-importance weight, target_like = logw > 0.
    """
    lam_row = dsir_model(df, target_source=target_source,
                         n_buckets=n_buckets, k_smooth=k_smooth,
                         text_col=text_col)
    return _dsir_select(df.crossJoin(F.broadcast(lam_row)),
                        F.col("lam_map"), n_buckets, text_col)


def dsir_model(df: DataFrame, target_source: str = "src0",
               n_buckets: int = 64, k_smooth: float = 0.5,
               text_col: str = "text") -> DataFrame:
    """The DSIR model of :func:`dsir_weights` as a ONE-row frame
    (lam_map: bucket -> 6-dp micro-int log-ratio). Shared by the batch
    query (broadcast crossJoin) and the streaming scorer (collected
    once — the 2*n_buckets-entry map IS the model — and embedded as a
    literal), so stream==batch equality is by construction of the same
    expressions."""
    toks = tokens_col(text_col)
    bkt = (_md5_int(F.col("tok")) % n_buckets).alias("bkt")
    counts = (df.select(F.explode(toks).alias("tok"), "source")
              .select(bkt, (F.col("source") == target_source).alias("is_t"))
              .groupBy("bkt")
              .agg(F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
                   F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cr")))
    kb = F.lit(float(k_smooth))
    # totals AND the per-bucket entries reduce in ONE single-row agg so
    # the corpus token-count pass runs exactly once; the log-ratio map
    # is then a pure expression over that row
    one = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr"),
        F.collect_list(F.struct("bkt", "ct", "cr")).alias("ent"))
    denom_t = F.col("tt") + kb * F.lit(float(n_buckets))
    denom_r = F.col("tr") + kb * F.lit(float(n_buckets))

    def lam_micro(e):
        lam = F.round(F.log(((e["ct"] + kb) / denom_t)
                            / ((e["cr"] + kb) / denom_r)), 6)
        return F.floor(lam * 1e6 + F.lit(0.5)).cast("long")

    # the model's value for a bucket with NO observed tokens (ct=cr=0):
    # the add-k smoothed log-ratio ln((k/denom_t)/(k/denom_r)). Buckets
    # absent from the map (possible when SCORING data the model was not
    # fit on, e.g. a stream) must fall back to this, not to NULL.
    dflt = F.round(F.log((kb / denom_t) / (kb / denom_r)), 6)
    dflt = F.floor(dflt * 1e6 + F.lit(0.5)).cast("long")

    # one-row broadcast map literal: bucket -> micro-int log-ratio
    return one.select(F.map_from_entries(F.array_sort(F.transform(
        F.col("ent"),
        lambda e: F.struct(e["bkt"].alias("bkt"),
                           lam_micro(e).alias("lm")))))
        .alias("lam_map"),
        dflt.alias("lam_default"))


def _dsir_select(df: DataFrame, lam_map_col, n_buckets: int,
                 text_col: str, default_col=None) -> DataFrame:
    """Per-document DSIR scoring projection against a bucket->micro-int
    log-ratio map column (broadcast row or literal): a pure array fold,
    zero shuffle. ``default_col`` is the smoothed empty-bucket value the
    model defines for buckets it never observed (``lam_default`` from
    :func:`dsir_model`) — without it a token hashing to an unseen bucket
    would NULL the whole document's score via element_at."""
    toks = tokens_col(text_col)
    score = _dsir_score_micro(lam_map_col, n_buckets, text_col, default_col)
    return df.select("doc_id", "source",
                     F.size(toks).cast("long").alias("n_toks"),
                     F.round(score.cast("double") / 1e6, 6).alias("logw"),
                     (score > 0).alias("target_like"))


def _dsir_score_micro(lam_map_col, n_buckets: int, text_col: str,
                      default_col=None):
    """The document's micro-int DSIR log-weight as a single column
    expression — shared by the batch scorer, the streaming scorer, and
    the streaming curation gate so their numbers agree token for
    token."""
    if default_col is None:
        default_col = F.col("lam_default")
    return F.aggregate(
        tokens_col(text_col), F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(
            F.element_at(lam_map_col, _md5_int(t) % n_buckets),
            default_col))


def intra_doc_chunk_dedup(df: DataFrame, chunk: int = 8,
                          text_col: str = "text") -> DataFrame:
    """Within-document repetition removal (the applied half of the
    Gopher/MassiveText repetition filters — repetition_stats only
    measures): split each document into non-overlapping ``chunk``-token
    chunks and keep the FIRST occurrence of each distinct chunk text,
    dropping later repeats. Boilerplate loops and copy-paste spans
    collapse to one copy; the tail chunk (< chunk tokens) participates
    like any other.

    Pure per-row array expressions (chunking, first-occurrence test via
    array_position, rejoin) — zero shuffle, linear in the corpus.
    Output (doc_id, n_chunks, n_kept, n_tokens_kept, scrub_hash) with
    scrub_hash = md5 of the space-rejoined surviving text, so the
    scrubbed content (not just counts) is oracle-checked.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_chunks = F.ceil(n.cast("double") / chunk).cast("int")
    texts = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda j: F.array_join(
            F.slice(toks, (j - F.lit(1)) * chunk + 1, chunk), " "))
    # keep chunk j iff its text first occurs at position j
    kept = F.filter(
        F.sequence(F.lit(1), n_chunks),
        lambda j: F.array_position(texts, F.element_at(texts, j)) == j
        .cast("long"))
    kept_texts = F.transform(kept, lambda j: F.element_at(texts, j))
    scrubbed = F.array_join(kept_texts, " ")
    n_tokens_kept = F.aggregate(
        kept, F.lit(0).cast("long"),
        lambda acc, j: acc + F.least(chunk * j, n.cast("long"))
        - (j - 1) * chunk)
    return df.select(
        "doc_id",
        n_chunks.cast("long").alias("n_chunks"),
        F.size(kept).cast("long").alias("n_kept"),
        n_tokens_kept.alias("n_tokens_kept"),
        F.md5(scrubbed).alias("scrub_hash"))
