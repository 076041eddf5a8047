"""Deterministic cardinality / frequency sketches.

Two classic streaming sketches re-expressed as DataFrame plans with
exact DuckDB oracles (possible because the hash functions are the
shared explicit md5->60-bit-int primitive, not engine-native `hash`):

- KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  Beyer et al., SIGMOD'07): keep the k smallest hash values of the
  distinct items; estimate D = (k-1) * 2^60 / h_(k). The Spark plan is
  distinct -> TakeOrderedAndProject(k) -> single-row agg: the partial
  top-k runs map-side per partition, so the shuffle carries at most
  k rows per partition regardless of corpus size — the same merge
  shape a real sketch union uses at 100 TB.
- Count-min sketch (Cormode & Muthukrishnan 2005): depth d rows of
  width w counters, cell(r, item) = md5int(r || item) % w; estimate =
  min over rows of the addressed counter. Build is one map-side
  combinable groupBy over d*w cells (the sketch itself is tiny); probe
  estimates broadcast-join the sketch.

Unlike ``approx_count_distinct`` (engine-private HLL, not
cross-checkable), these produce bit-identical results in any engine
that can md5 — which is what makes them *testable* sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from golem_spark.pipeline.text import _md5_int

_TWO60 = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int = 64,
                 seed: int = 0) -> DataFrame:
    """KMV distinct-count estimate for ``col``.

    Returns one row: (k, kth_hash, est_distinct, exact_distinct,
    rel_err). ``exact_distinct`` is included so the estimate is
    self-auditing; at production scale drop it (the sketch exists so
    you never pay the exact distinct).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = _md5_int(F.concat_ws("_", F.col(col).cast("string"), F.lit(str(seed))))
    hashes = df.select(h.alias("h")).distinct()
    kmin = hashes.orderBy("h").limit(k)
    exact = df.select(F.countDistinct(F.col(col)).alias("exact_distinct"))
    est = (kmin.agg(F.max("h").alias("kth_hash"),
                    F.count("*").alias("n_kept"))
           .select(
               F.lit(k).cast("long").alias("k"),
               "kth_hash",
               # when fewer than k distinct values exist the sketch is
               # exact: it holds every hash
               F.round(
                   F.when(F.col("n_kept") < k,
                          F.col("n_kept").cast("double"))
                   .otherwise((F.lit(float(k - 1)) * F.lit(_TWO60))
                              / F.col("kth_hash").cast("double")),
                   6).alias("est_distinct")))
    out = est.crossJoin(F.broadcast(exact))
    return out.select(
        "k", "kth_hash", "est_distinct", "exact_distinct",
        F.round((F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"), 6).alias("rel_err"))


def kmv_distinct_sql(table_expr: str, col_expr: str, k: int = 64,
                     seed: int = 0) -> str:
    """DuckDB oracle for :func:`kmv_distinct` (same hash, same math)."""
    h = (f"(('0x' || substr(md5(concat_ws('_', CAST({col_expr} AS VARCHAR), "
         f"'{seed}')), 1, 15))::BIGINT)")
    return f"""
    WITH hashes AS (
      SELECT DISTINCT {h} AS h FROM {table_expr}),
    kmin AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
    est AS (
      SELECT {k}::BIGINT AS k, MAX(h) AS kth_hash,
             ROUND(CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE
                   ELSE ({float(k - 1)} * {_TWO60}) / MAX(h)::DOUBLE END,
                   6) AS est_distinct
      FROM kmin),
    ex AS (SELECT COUNT(DISTINCT {col_expr})::BIGINT AS exact_distinct
           FROM {table_expr})
    SELECT k, kth_hash, est_distinct, exact_distinct,
           ROUND((est_distinct - exact_distinct) / exact_distinct, 6)
             AS rel_err
    FROM est, ex
    """


def cms_token_freq(df: DataFrame, text_col: str = "text", depth: int = 3,
                   width: int = 1024, top_k: int = 20) -> DataFrame:
    """Count-min sketch over whitespace tokens; probes the ``top_k``
    most frequent tokens (deterministic tie-break on the token) and
    reports true vs sketch counts.

    Returns (tok, true_count, cms_count, overcount). cms_count >=
    true_count always (CMS never undercounts); equality on the heavy
    hitters shows the width is adequate.
    """
    toks = (df.select(F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("tok")))
    counts = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    # the sketch: d rows of w counters; one combinable groupBy builds all
    # rows at once via a posexploded (row, cell) array
    cells = toks.select(
        F.posexplode(F.array(*[
            (_md5_int(F.concat_ws(":", F.lit(str(r)), F.col("tok")))
             % F.lit(width)).alias(f"c{r}")
            for r in range(depth)
        ])).alias("row", "cell"))
    sketch = cells.groupBy("row", "cell").agg(F.count("*").alias("cnt"))
    probes = (counts.orderBy(F.col("true_count").desc(), F.col("tok"))
              .limit(top_k))
    probed = probes.select(
        "tok", "true_count",
        F.posexplode(F.array(*[
            (_md5_int(F.concat_ws(":", F.lit(str(r)), F.col("tok")))
             % F.lit(width))
            for r in range(depth)
        ])).alias("row", "cell"))
    est = (probed.join(F.broadcast(sketch), ["row", "cell"])
           .groupBy("tok", "true_count")
           .agg(F.min("cnt").alias("cms_count")))
    return (est
            .select("tok", "true_count", "cms_count",
                    (F.col("cms_count") - F.col("true_count"))
                    .alias("overcount"))
            .orderBy(F.col("true_count").desc(), "tok"))


def cms_token_freq_sql(depth: int = 3, width: int = 1024,
                       top_k: int = 20) -> str:
    """DuckDB oracle for :func:`cms_token_freq` on the documents table."""
    def cell(r: str, tok: str) -> str:
        return (f"((('0x' || substr(md5(concat_ws(':', '{r}', {tok})), 1, 15))"
                f"::BIGINT) % {width})")

    rows = ", ".join(f"{cell(str(r), 'tok')} AS c{r}" for r in range(depth))
    unpiv = " UNION ALL ".join(
        f"SELECT {r} AS row, c{r} AS cell, tok FROM tok_cells"
        for r in range(depth))
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents),
    counts AS (
      SELECT tok, COUNT(*)::BIGINT AS true_count FROM toks GROUP BY tok),
    tok_cells AS (SELECT tok, {rows} FROM toks),
    cells AS ({unpiv}),
    sketch AS (
      SELECT row, cell, COUNT(*)::BIGINT AS cnt
      FROM cells GROUP BY row, cell),
    probes AS (
      SELECT tok, true_count FROM counts
      ORDER BY true_count DESC, tok LIMIT {top_k}),
    probe_cells AS (
      SELECT p.tok, p.true_count, pc.row, pc.cell
      FROM probes p, LATERAL (
        {" UNION ALL ".join(f"SELECT {r} AS row, {cell(str(r), 'p.tok')} AS cell"
                            for r in range(depth))}) pc),
    est AS (
      SELECT pc.tok, pc.true_count, MIN(s.cnt) AS cms_count
      FROM probe_cells pc JOIN sketch s ON s.row = pc.row AND s.cell = pc.cell
      GROUP BY pc.tok, pc.true_count)
    SELECT tok, true_count, cms_count,
           (cms_count - true_count) AS overcount
    FROM est ORDER BY true_count DESC, tok
    """


def hll_distinct(df: DataFrame, col: str, n_buckets: int = 64,
                 seed: int = 0) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
    fully deterministic, cross-engine-checkable register build.

    Hash layout over the shared 60-bit md5 int: bucket = h & (m-1),
    w = h >> log2(m) (a 54-bit remainder), rho = leading-zero rank =
    55 - bitlength(w) (w = 0 -> 55). Registers M_j = max rho per
    bucket — ONE map-side-combinable groupBy over at most m rows, the
    cheapest possible shuffle shape; sketch union at 100 TB is the same
    max-merge. The harmonic sum is accumulated as 2^(55-M_j) in exact
    64-bit INTEGER arithmetic (sum order-independent, unlike float
    2^-M_j), so the estimate is bit-identical in any engine.

    Small-range correction: raw E <= 2.5m with V empty registers ->
    LinearCounting m*ln(m/V).

    Returns one row: (m, n_hit, sum_reg, inv_scaled, est_distinct,
    exact_distinct, rel_err); exact_distinct is the self-audit column.
    """
    m = n_buckets
    if m < 16 or m & (m - 1):
        raise ValueError("n_buckets must be a power of two >= 16")
    log2m = m.bit_length() - 1
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    h = _md5_int(F.concat_ws("_", F.col(col).cast("string"), F.lit(str(seed))))
    w = F.shiftright(h, log2m)
    rho = (F.when(w == 0, F.lit(55))
           .otherwise(F.lit(55) - F.length(F.bin(w)))).cast("int")
    regs = (df.select(h.bitwiseAND(m - 1).alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("reg")))
    sketch = regs.agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum("reg").cast("long").alias("sum_reg"),
        F.sum(F.expr("shiftleft(1L, 55 - reg)")).alias("inv_scaled"))
    exact = df.select(F.countDistinct(F.col(col)).alias("exact_distinct"))
    two55 = float(1 << 55)
    est = sketch.crossJoin(F.broadcast(exact)).select(
        F.lit(m).cast("long").alias("m"),
        "n_hit", "sum_reg", "inv_scaled", "exact_distinct",
        (F.col("inv_scaled").cast("double") / F.lit(two55)
         + (F.lit(m) - F.col("n_hit")).cast("double")).alias("__inv"),
        (F.lit(m) - F.col("n_hit")).cast("double").alias("__v"))
    raw = F.lit(alpha * m * m) / F.col("__inv")
    corrected = F.when((raw <= F.lit(2.5 * m)) & (F.col("__v") > 0),
                       F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__v"))
                       ).otherwise(raw)
    return est.select(
        "m", "n_hit", "sum_reg", "inv_scaled",
        F.round(corrected, 4).alias("est_distinct"),
        "exact_distinct",
        F.round((corrected - F.col("exact_distinct"))
                / F.col("exact_distinct"), 4).alias("rel_err"))


def hll_distinct_sql(table_expr: str, col_expr: str, n_buckets: int = 64,
                     seed: int = 0) -> str:
    """DuckDB oracle for :func:`hll_distinct` (same hash, same integer
    harmonic accumulation, same correction)."""
    m = n_buckets
    log2m = m.bit_length() - 1
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    h = (f"(('0x' || substr(md5(concat_ws('_', CAST({col_expr} AS VARCHAR), "
         f"'{seed}')), 1, 15))::BIGINT)")
    return f"""
    WITH hashed AS (
      SELECT {h} & {m - 1} AS bucket,
             {h} >> {log2m} AS w
      FROM {table_expr}),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN w = 0 THEN 55
                 ELSE 55 - length(bin(w)) END)::INT AS reg
      FROM hashed GROUP BY bucket),
    sk AS (
      SELECT COUNT(*)::BIGINT AS n_hit,
             SUM(reg)::BIGINT AS sum_reg,
             SUM((1::BIGINT << (55 - reg)))::BIGINT AS inv_scaled
      FROM regs),
    ex AS (SELECT COUNT(DISTINCT {col_expr})::BIGINT AS exact_distinct
           FROM {table_expr}),
    est AS (
      SELECT {m}::BIGINT AS m, n_hit, sum_reg, inv_scaled, exact_distinct,
             inv_scaled::DOUBLE / {float(1 << 55)}
               + ({m} - n_hit)::DOUBLE AS inv_total,
             ({m} - n_hit)::DOUBLE AS v
      FROM sk, ex)
    SELECT m, n_hit, sum_reg, inv_scaled,
           ROUND(CASE WHEN {alpha * m * m} / inv_total <= {2.5 * m} AND v > 0
                 THEN {float(m)} * ln({float(m)} / v)
                 ELSE {alpha * m * m} / inv_total END, 4) AS est_distinct,
           exact_distinct,
           ROUND((CASE WHEN {alpha * m * m} / inv_total <= {2.5 * m} AND v > 0
                  THEN {float(m)} * ln({float(m)} / v)
                  ELSE {alpha * m * m} / inv_total END - exact_distinct)
                 / exact_distinct, 4) AS rel_err
    FROM est
    """


def bloom_probe(corpus: DataFrame, probe: DataFrame, n: int = 5,
                m_bits: int = 8192, depth: int = 3,
                text_col: str = "text") -> DataFrame:
    """Bloom-filter membership of the probe set's word n-grams against
    the corpus's n-grams — the sketch that replaces an exact
    decontamination join when the corpus side is 100 TB: the bit array
    (m_bits bits, here materialized as at most m_bits distinct set
    positions) is corpus-size-independent and broadcastable, so probing
    costs a map-side broadcast join instead of a corpus shuffle.

    Deterministic d-fold hashing via the shared md5 primitive; the
    result row self-audits against the exact distinct-gram join (drop
    that at production scale — it is what the bloom filter avoids).

    Returns one row: (m_bits, depth, n_bits_set, n_probe, n_true,
    n_pass, n_false_pos, fpr).
    """
    from golem_spark.pipeline.dedup import _ngrams_concat
    from golem_spark.pipeline.text import tokens_col

    if m_bits < 64 or depth < 1:
        raise ValueError("m_bits must be >= 64 and depth >= 1")

    def grams(df):
        return (df.select(F.explode(_ngrams_concat(tokens_col(text_col), n))
                          .alias("gram")).distinct())

    # the corpus gram stream is consumed twice (bit-set build +
    # exact-join self-audit), but NEITHER consumer needs the
    # corpus-gram DISTINCT the old shape paid for twice — the only
    # corpus-scale shuffles in the query:
    #   * the bit set dedupes at POSITION level (<= m_bits values, so
    #     the per-partition partial-distinct partials are bounded by
    #     m_bits regardless of corpus size);
    #   * the audit counts DISTINCT matched grams after an inner
    #     broadcast join with the probe set (partials bounded by the
    #     probe gram count per partition).
    # Both passes are corpus scan + explode + map-side work + bounded
    # shuffle; in production the audit pass is dropped entirely.
    cg_raw = (corpus.select(
        F.explode(_ngrams_concat(tokens_col(text_col), n)).alias("gram")))
    pg = grams(probe)

    def positions(gram_col):
        return F.array(*[
            _md5_int(F.concat(F.lit(f"b{i}_"), gram_col)) % m_bits
            for i in range(depth)])

    bits = (cg_raw.select(F.explode(positions(F.col("gram"))).alias("pos"))
            .distinct())
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    probe_pos = pg.select("gram", F.explode(positions(F.col("gram")))
                          .alias("pos"))
    # bits is <= m_bits rows: broadcast, so probing never shuffles pg
    passes = (probe_pos.join(F.broadcast(bits), "pos")
              .groupBy("gram").agg(F.count(F.lit(1)).alias("n_set"))
              .filter(F.col("n_set") == depth)
              .select("gram"))
    truth_cnt = (cg_raw.join(F.broadcast(pg), "gram")
                 .agg(F.countDistinct("gram").alias("n_true")))
    summary = (pg.agg(F.count(F.lit(1)).alias("n_probe"))
               .crossJoin(F.broadcast(truth_cnt))
               .crossJoin(F.broadcast(passes.agg(
                   F.count(F.lit(1)).alias("n_pass"))))
               .crossJoin(F.broadcast(n_bits)))
    return summary.select(
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(depth).cast("long").alias("depth"),
        F.col("n_bits_set").cast("long"),
        F.col("n_probe").cast("long"),
        F.col("n_true").cast("long"),
        F.col("n_pass").cast("long"),
        (F.col("n_pass") - F.col("n_true")).cast("long").alias("n_false_pos"),
        F.round((F.col("n_pass") - F.col("n_true"))
                / F.greatest(F.col("n_probe") - F.col("n_true"), F.lit(1)),
                6).alias("fpr"))


def kmv_distinct_by_group(df: DataFrame, group_col: str, col: str,
                          k: int = 32, seed: int = 0) -> DataFrame:
    """Per-group KMV distinct-count sketch: the grouped form of
    :func:`kmv_distinct` — per group, keep the k smallest hashes (a
    rank window that executes as a per-partition partial top-k) and
    estimate D_g = (k-1) * 2^60 / h_(k). This is the sketch-union shape
    for per-tenant / per-source cardinality dashboards at corpus scale:
    k rows per group per partition cross the shuffle, never the data.

    Returns (group, n_kept, kth_hash, est_distinct, exact_distinct).
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    h = _md5_int(F.concat_ws("_", F.col(col).cast("string"), F.lit(str(seed))))
    hashes = df.select(F.col(group_col), h.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    kmin = (hashes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k))
    est = (kmin.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.max("h").alias("kth_hash"))
           .select(group_col, "n_kept", "kth_hash",
                   F.round(
                       F.when(F.col("n_kept") < k,
                              F.col("n_kept").cast("double"))
                       .otherwise((F.lit(float(k - 1)) * F.lit(_TWO60))
                                  / F.col("kth_hash").cast("double")),
                       6).alias("est_distinct")))
    exact = df.groupBy(group_col).agg(
        F.countDistinct(F.col(col)).alias("exact_distinct"))
    return est.join(F.broadcast(exact), group_col)


def kmv_key_sketch(df: DataFrame, col: str, k: int = 128,
                   seed: int = 0) -> DataFrame:
    """The k smallest distinct key hashes of ``df[col]`` — one
    distinct + partial-top-k pass (compiles to TakeOrderedAndProject:
    k rows per partition cross the network, never a global sort).
    Shared building block of :func:`kmv_join_estimate`; exposed so the
    plan-shape gate in tests/test_plans.py can audit it directly.
    """
    h = _md5_int(F.concat_ws("_", F.col(col).cast("string"),
                             F.lit(str(seed))))
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_join_estimate(dfa: DataFrame, col_a: str, dfb: DataFrame,
                      col_b: str, k: int = 128, seed: int = 0) -> DataFrame:
    """EAGER join-cardinality estimation from KMV sketches (Beyer et
    al. SIGMOD'07 multi-set extension): runs the Spark jobs AT CALL
    TIME and returns the one-row result as a small driver-materialized
    frame (so the two persisted sketches can be released before
    returning — repeated calls don't accumulate cached frames). Do not
    call during pure plan construction. The optimizer-statistics shape:
    estimate |A JOIN B| BEFORE running the join, from two k-sized
    sketches plus each side's row count.

    Math: sketch each side's DISTINCT key hashes (k smallest, shared
    hash so sketches are comparable); the k smallest of the sketch
    UNION estimate |keys(A) ∪ keys(B)|; the fraction p/k of those
    present in BOTH sketches estimates Jaccard; intersection ≈ J·U;
    per-key-uniform multiplicity (n_rows/distinct per side) turns key
    overlap into an expected join row count. The exact join count rides
    along as the self-audit — at production scale you never pay it.

    Scale shape: each side contributes ONE distinct+TakeOrdered pass
    (k rows per partition cross the shuffle); everything after is
    k-row-frame algebra on broadcasts. Estimates are derived from
    ROUNDED components in a fixed expression order, so the emitted
    numbers are reproducible bit-for-bit across engines.
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    # the two sketches are k = O(100) integer hashes each: collect them
    # and do the SET algebra (kth/max, counts, sketch union, membership
    # overlap) on the driver — the old shape ran it as five broadcast
    # subquery jobs over persisted k-row frames. All driver math is
    # exact integer work; every FLOAT estimate (and its rounding) stays
    # a Spark expression below with these integers embedded as
    # literals, so emitted numbers are bit-identical.
    ha = sorted(r["h"] for r in kmv_key_sketch(dfa, col_a, k, seed).collect())
    hb = sorted(r["h"] for r in kmv_key_sketch(dfb, col_b, k, seed).collect())
    hu = sorted(set(ha) | set(hb))[:k]
    inboth = set(ha) & set(hb)
    comp = {"kth_a": ha[-1] if ha else None, "na_k": len(ha),
            "kth_b": hb[-1] if hb else None, "nb_k": len(hb),
            "kth_u": hu[-1] if hu else None, "nu_k": len(hu),
            "p": sum(1 for h in hu if h in inboth)}

    def est_expr(cnt_col, kth_col):
        return F.round(
            F.when(F.col(cnt_col) < k, F.col(cnt_col).cast("double"))
            .otherwise((F.lit(float(k - 1)) * F.lit(_TWO60))
                       / F.col(kth_col).cast("double")), 6)

    # one Spark action for the remaining corpus-scale pieces: the two
    # row counts and the exact-join self-audit (at production scale you
    # never pay the audit)
    stats = (dfa.agg(F.count("*").alias("rows_a"))
             .crossJoin(F.broadcast(
                 dfb.agg(F.count("*").alias("rows_b"))))
             .crossJoin(F.broadcast(
                 dfa.select(F.col(col_a).alias("jk")).join(
                     dfb.select(F.col(col_b).alias("jk")), "jk")
                 .agg(F.count("*").alias("exact_join_rows")))))
    for name, val in comp.items():
        stats = stats.withColumn(name, F.lit(val).cast("long"))
    est = stats.select(
        F.lit(k).cast("long").alias("k"),
        est_expr("na_k", "kth_a").alias("est_keys_a"),
        est_expr("nb_k", "kth_b").alias("est_keys_b"),
        est_expr("nu_k", "kth_u").alias("est_union"),
        F.round(F.col("p").cast("double")
                / F.least(F.col("nu_k"), F.lit(k)).cast("double"),
                6).alias("jaccard"),
        "rows_a", "rows_b", "exact_join_rows")
    # combine ROUNDED components in a fixed order (cross-engine stable)
    est_join = F.round(
        F.col("jaccard") * F.col("est_union")
        * (F.col("rows_a").cast("double") / F.col("est_keys_a"))
        * (F.col("rows_b").cast("double") / F.col("est_keys_b")), 3)
    out = est.select(
        "k", "est_keys_a", "est_keys_b", "est_union", "jaccard",
        est_join.alias("est_join_rows"), "exact_join_rows",
        F.when(F.col("exact_join_rows") > 0,
               F.round((est_join - F.col("exact_join_rows"))
                       / F.col("exact_join_rows"), 6))
        .otherwise(F.lit(0.0)).alias("rel_err"))
    # The result is one scalar row: evaluate it eagerly (nothing stays
    # persisted — the sketches were collected above).
    rows = out.collect()
    return dfa.sparkSession.createDataFrame(rows, out.schema)


def kmv_join_estimate_sql(table_a: str, col_a: str, table_b: str,
                          col_b: str, k: int = 128, seed: int = 0) -> str:
    """DuckDB oracle for :func:`kmv_join_estimate` — same hash, same
    rounded-component combination order."""
    def h(c):
        return (f"(('0x' || substr(md5(concat_ws('_', CAST({c} AS VARCHAR), "
                f"'{seed}')), 1, 15))::BIGINT)")

    def est(cnt, kth):
        return (f"ROUND(CASE WHEN {cnt} < {k} THEN {cnt}::DOUBLE "
                f"ELSE ({float(k - 1)} * {_TWO60}) / {kth}::DOUBLE END, 6)")

    return f"""
    WITH ka AS (SELECT DISTINCT {h(col_a)} AS h FROM {table_a}
                ORDER BY h LIMIT {k}),
    kb AS (SELECT DISTINCT {h(col_b)} AS h FROM {table_b}
           ORDER BY h LIMIT {k}),
    ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL
                                   SELECT h FROM kb)
           ORDER BY h LIMIT {k}),
    inboth AS (SELECT ka.h FROM ka JOIN kb USING (h)),
    comp AS (
      SELECT (SELECT MAX(h) FROM ka) AS kth_a, (SELECT COUNT(*) FROM ka) AS na_k,
             (SELECT MAX(h) FROM kb) AS kth_b, (SELECT COUNT(*) FROM kb) AS nb_k,
             (SELECT MAX(h) FROM ku) AS kth_u, (SELECT COUNT(*) FROM ku) AS nu_k,
             (SELECT COUNT(*) FROM ku JOIN inboth USING (h)) AS p,
             (SELECT COUNT(*) FROM {table_a}) AS rows_a,
             (SELECT COUNT(*) FROM {table_b}) AS rows_b,
             (SELECT COUNT(*) FROM {table_a} a JOIN {table_b} b
              ON a.{col_a} = b.{col_b}) AS exact_join_rows),
    est AS (
      SELECT {k}::BIGINT AS k,
             {est("na_k", "kth_a")} AS est_keys_a,
             {est("nb_k", "kth_b")} AS est_keys_b,
             {est("nu_k", "kth_u")} AS est_union,
             ROUND(p::DOUBLE / least(nu_k, {k})::DOUBLE, 6) AS jaccard,
             rows_a, rows_b, exact_join_rows
      FROM comp)
    SELECT k, est_keys_a, est_keys_b, est_union, jaccard,
           ROUND(jaccard * est_union * (rows_a::DOUBLE / est_keys_a)
                 * (rows_b::DOUBLE / est_keys_b), 3) AS est_join_rows,
           exact_join_rows,
           CASE WHEN exact_join_rows > 0 THEN
             ROUND((ROUND(jaccard * est_union * (rows_a::DOUBLE / est_keys_a)
                          * (rows_b::DOUBLE / est_keys_b), 3)
                    - exact_join_rows) / exact_join_rows, 6)
           ELSE 0.0 END AS rel_err
    FROM est
    """
