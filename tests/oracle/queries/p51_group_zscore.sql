SELECT doc_id, lang,
           ROUND(CASE WHEN stddev_samp(n_chars) OVER (PARTITION BY lang) > 0
                 THEN (n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                      / stddev_samp(n_chars) OVER (PARTITION BY lang)
                 ELSE 0.0 END, 6) AS z
    FROM documents ORDER BY doc_id
