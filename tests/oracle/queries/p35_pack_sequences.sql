WITH tc AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             (SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens) AS cum_before
      FROM tc)
    SELECT CAST(floor(cum_before / 2048.0) AS BIGINT) AS bin_id,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c GROUP BY 1 ORDER BY bin_id
