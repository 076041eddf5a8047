WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 0) + 1),
               i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS gram
      FROM w),
    b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10)
    SELECT g.doc_id, COUNT(*)::BIGINT AS n_grams,
           SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_matched,
           ROUND(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / greatest(COUNT(*), 1)::DOUBLE, 6) AS containment
    FROM g LEFT JOIN b ON g.gram = b.gram
    GROUP BY g.doc_id ORDER BY g.doc_id
