SELECT md5(text) AS text_hash,
           COUNT(*)::BIGINT AS n_dups,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY md5(text) HAVING COUNT(*) > 1
    ORDER BY text_hash
