WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM w)
    SELECT bigram, COUNT(*)::BIGINT AS n
    FROM g GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 100
