WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY (('0x' || substr(md5(doc_id::VARCHAR || '_11'), 1, 15))::BIGINT),
                        doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM r WHERE rn <= 5 ORDER BY doc_id
