WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*)::DOUBLE AS c
          FROM toks GROUP BY doc_id, tok)
    SELECT doc_id, SUM(c)::BIGINT AS n_tokens,
           ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
    FROM c GROUP BY doc_id ORDER BY doc_id
