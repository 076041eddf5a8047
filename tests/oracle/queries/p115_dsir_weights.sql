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
      GROUP BY tk.doc_id)
    SELECT w.doc_id, w.source, len(toks)::BIGINT AS n_toks,
           ROUND(sm / 1e6, 6) AS logw, (sm > 0) AS target_like
    FROM w JOIN sc ON w.doc_id = sc.doc_id
    ORDER BY w.doc_id
