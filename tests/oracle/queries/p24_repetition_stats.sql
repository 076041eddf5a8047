WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, toks,
             list_transform(range(1, greatest(len(toks), 1)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS grams
      FROM w)
    SELECT doc_id,
           ROUND((len(toks) - len(list_distinct(toks)))::DOUBLE
                 / greatest(len(toks), 1), 6) AS dup_token_frac,
           ROUND((len(grams) - len(list_distinct(grams)))::DOUBLE
                 / greatest(len(grams), 1), 6) AS dup_bigram_frac,
           ROUND(COALESCE(list_max(list_transform(list_distinct(grams),
                     x -> len(list_filter(grams, b -> b = x))))::DOUBLE, 0.0)
                 / greatest(len(grams), 1), 6) AS top_bigram_frac
    FROM g ORDER BY doc_id
