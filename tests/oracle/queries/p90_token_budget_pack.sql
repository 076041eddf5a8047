SELECT doc_id, source, n_chars,
           (SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING)
            - n_chars)::BIGINT AS cum_before,
           CASE WHEN (SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                      - n_chars) < 3000 THEN 1 ELSE 0 END AS kept
    FROM documents ORDER BY doc_id
