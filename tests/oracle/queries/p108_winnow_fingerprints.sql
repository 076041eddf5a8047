WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    hs AS (
      SELECT doc_id, len(toks) - 2 AS n_grams,
             [('0x' || substr(md5(array_to_string(
                  list_slice(toks, i, i + 2), ' ')), 1, 15))::BIGINT
              FOR i IN range(1, len(toks) - 2 + 1)] AS h
      FROM t WHERE len(toks) >= 3),
    win AS (
      SELECT doc_id, n_grams,
             greatest(n_grams - 3, 1) AS n_windows,
             list_distinct([list_min(h[j:j+3])
                            FOR j IN range(1, greatest(n_grams - 3, 1) + 1)])
               AS sel
      FROM hs)
    SELECT doc_id, n_grams::BIGINT AS n_grams, n_windows::BIGINT AS n_windows,
           len(sel)::BIGINT AS n_selected,
           (list_aggregate([x % 2147483647 FOR x IN sel], 'sum')
            % 2147483647)::BIGINT AS fp_checksum
    FROM win ORDER BY doc_id
