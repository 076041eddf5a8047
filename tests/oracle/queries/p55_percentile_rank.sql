SELECT doc_id, lang,
           ROUND(CUME_DIST() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id), 6) AS pct_rank
    FROM documents ORDER BY doc_id
