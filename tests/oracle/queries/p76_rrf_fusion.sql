WITH lens AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE AS dl
      FROM documents),
    stats AS (
      SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM lens),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    qtf AS (
      SELECT doc_id, tok, COUNT(*)::DOUBLE AS tf
      FROM toks WHERE tok IN ('join', 'hash', 'scan')
      GROUP BY doc_id, tok),
    qdf AS (SELECT tok, COUNT(*)::DOUBLE AS df FROM qtf GROUP BY tok),
    bm AS (
      SELECT qtf.doc_id,
             ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * tf * 2.2
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
               AS score
      FROM qtf JOIN qdf ON qtf.tok = qdf.tok
               JOIN lens ON qtf.doc_id = lens.doc_id, stats
      GROUP BY qtf.doc_id
      ORDER BY score DESC, qtf.doc_id LIMIT 50),
    bm_r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bm),
    uni AS (SELECT tok, COUNT(*)::DOUBLE AS c FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*)::DOUBLE AS total FROM toks),
    lm AS (
      SELECT doc_id,
             ROUND(AVG(ln(c / total)), 6) AS lm_logprob
      FROM toks JOIN uni USING (tok), tot
      GROUP BY doc_id
      ORDER BY lm_logprob DESC, doc_id LIMIT 50),
    lm_r AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY lm_logprob DESC, doc_id) AS rank
      FROM lm),
    fused AS (
      SELECT doc_id, 1.0 / (60 + rank) AS c FROM bm_r
      UNION ALL
      SELECT doc_id, 1.0 / (60 + rank) AS c FROM lm_r)
    SELECT doc_id, ROUND(SUM(c), 6) AS rrf
    FROM fused GROUP BY doc_id
    ORDER BY rrf DESC, doc_id LIMIT 10
