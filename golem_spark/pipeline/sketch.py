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
