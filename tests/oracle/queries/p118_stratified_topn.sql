WITH h AS (
      SELECT doc_id, lang, source, n_chars,
             (('0x' || substr(md5(doc_id::VARCHAR || '_0'), 1, 15))::BIGINT)
             AS hv
      FROM documents),
    r AS (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY hv, doc_id) AS rk
      FROM h)
    SELECT doc_id, lang, source, n_chars, rk
    FROM r WHERE rk <= 3
    ORDER BY lang, source, rk
