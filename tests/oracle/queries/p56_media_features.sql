WITH b AS (
      SELECT doc_id, ord(substr(text, i, 1))::DOUBLE AS byte
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
    c AS (
      SELECT doc_id, byte, COUNT(*)::DOUBLE AS c
      FROM b GROUP BY doc_id, byte)
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                ELSE 'audio/wav' END AS media_type,
           SUM(c)::BIGINT AS n_bytes,
           ROUND(SUM(byte * c) / SUM(c), 6) AS byte_mean,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6)
             AS byte_entropy
    FROM c GROUP BY doc_id ORDER BY doc_id
