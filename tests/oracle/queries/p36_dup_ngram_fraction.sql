WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 4, 0) + 1),
               i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
      FROM w),
    gdf AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS gdf FROM g GROUP BY gram)
    SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
           SUM(CASE WHEN gdf > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
           ROUND(SUM(CASE WHEN gdf > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / greatest(COUNT(*), 1)::DOUBLE, 6) AS dup_frac
    FROM g JOIN gdf USING (gram)
    GROUP BY doc_id ORDER BY doc_id
