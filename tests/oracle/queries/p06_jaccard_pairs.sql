WITH d AS (
      SELECT doc_id, lang, (n_chars // 100) AS len_bucket,
             list_distinct(string_split_regex(trim(text), '\s+')) AS toks
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE
                 / len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE, 6) AS jaccard
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
          / len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE >= 0.5
    ORDER BY doc_a, doc_b
