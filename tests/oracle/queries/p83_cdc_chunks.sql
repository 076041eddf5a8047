WITH toks AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM (SELECT doc_id,
                   string_split_regex(trim(text), '\s+') AS toks
            FROM documents),
           unnest(range(1, len(toks) + 1)) AS t(i)),
    flagged AS (
      SELECT doc_id, pos, tok,
             CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT) % 8 = 0
                  THEN 1 ELSE 0 END AS flag
      FROM toks),
    chunked AS (
      SELECT doc_id, pos, tok,
             COALESCE(SUM(flag) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_idx
      FROM flagged),
    rel AS (
      SELECT doc_id, chunk_idx,
             (('0x' || substr(md5((pos - MIN(pos) OVER (PARTITION BY doc_id, chunk_idx))::VARCHAR || ':' || tok), 1, 15))::BIGINT) AS h
      FROM chunked),
    chunks AS (
      SELECT doc_id, chunk_idx,
             SUM(h % 1073741824) AS fp1,
             SUM(h // 1073741824) AS fp2,
             COUNT(*) AS fp_len
      FROM rel GROUP BY doc_id, chunk_idx),
    gdf AS (
      SELECT fp1, fp2, fp_len, COUNT(DISTINCT doc_id) AS gdf
      FROM chunks GROUP BY fp1, fp2, fp_len)
    SELECT doc_id, COUNT(*)::BIGINT AS n_chunks,
           SUM(CASE WHEN gdf > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
           ROUND(SUM(CASE WHEN gdf > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / greatest(COUNT(*), 1), 6) AS dup_frac
    FROM chunks JOIN gdf USING (fp1, fp2, fp_len)
    GROUP BY doc_id ORDER BY doc_id
