WITH w AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    tk AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(tok), 1, 15))::BIGINT) % 64 AS bkt
      FROM w, unnest(toks) AS t(tok)),
    cnt AS (
      SELECT bkt,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::DOUBLE AS ct,
             SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)::DOUBLE AS cr
      FROM tk GROUP BY bkt),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
    lam AS (
      SELECT bkt,
             floor(round(ln(((ct + 0.5) / (tt + 0.5 * 64))
                            / ((cr + 0.5) / (tr + 0.5 * 64))), 6)
                   * 1e6 + 0.5)::BIGINT AS lm
      FROM cnt, tot),
    sc AS (
      SELECT tk.doc_id, SUM(lm) AS sm
      FROM tk JOIN lam USING (bkt)
      GROUP BY tk.doc_id),
    gated AS (
      SELECT w.doc_id, w.toks
      FROM w JOIN sc ON w.doc_id = sc.doc_id
      WHERE ROUND(sm / 1e6, 6) > -0.5),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(ceil(len(toks)::DOUBLE / 8) AS INT) AS nc
      FROM gated),
    tx AS (
      SELECT doc_id, n, nc,
             list_transform(range(1, nc + 1),
               j -> array_to_string(
                 list_slice(toks, (j - 1) * 8 + 1, (j - 1) * 8 + 8), ' '))
               AS texts
      FROM c),
    k AS (
      SELECT doc_id, n, nc,
             list_filter(range(1, nc + 1),
                         j -> list_position(texts, texts[j]) = j) AS kept
      FROM tx),
    scrub AS (
      SELECT doc_id,
             list_sum(list_transform(kept,
               j -> least(8 * j, n) - (j - 1) * 8))::BIGINT AS n_tokens_kept
      FROM k),
    per AS (
      SELECT ((('0x' || substr(md5(doc_id::VARCHAR || '_0'), 1, 15))::BIGINT)) % 8
               AS shard,
             COUNT(*)::BIGINT AS n_docs,
             SUM(n_tokens_kept)::BIGINT AS tokens_kept
      FROM scrub GROUP BY shard),
    mtot AS (SELECT SUM(n_docs) AS t FROM per)
    SELECT shard, n_docs, tokens_kept,
           (n_docs * 1000000 // t)::BIGINT AS load_ppm
    FROM per, mtot ORDER BY shard
