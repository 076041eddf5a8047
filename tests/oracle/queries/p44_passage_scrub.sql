WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    ch AS (
      SELECT doc_id, (i - 1)::BIGINT AS pos,
             array_to_string(list_slice(toks, (i-1)*4 + 1, (i-1)*4 + 4), ' ')
               AS chunk
      FROM w, unnest(range(1, len(toks) // 4 + 1)) AS t(i)),
    k AS (
      SELECT doc_id, pos, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM ch),
    body AS (
      SELECT doc_id,
             COUNT(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
             string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1)
               AS body
      FROM k GROUP BY doc_id)
    SELECT w.doc_id, (len(toks) // 4)::BIGINT AS n_chunks,
           COALESCE(n_kept, 0) AS n_kept,
           md5(trim(concat_ws(' ', COALESCE(body, ''),
             CASE WHEN len(toks) % 4 > 0
                  THEN array_to_string(list_slice(toks, (len(toks)//4)*4 + 1,
                                                  len(toks)), ' ')
                  ELSE '' END))) AS clean_md5
    FROM w LEFT JOIN body ON w.doc_id = body.doc_id
    ORDER BY w.doc_id
