WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(ceil(len(toks)::DOUBLE / 8) AS INT) AS nc
      FROM w),
    tx AS (
      SELECT doc_id, n, nc,
             list_transform(range(1, nc + 1),
               j -> array_to_string(
                 list_slice(toks, (j - 1) * 8 + 1, (j - 1) * 8 + 8), ' '))
               AS texts
      FROM c),
    k AS (
      SELECT doc_id, n, nc, texts,
             list_filter(range(1, nc + 1),
                         j -> list_position(texts, texts[j]) = j) AS kept
      FROM tx)
    SELECT doc_id, nc::BIGINT AS n_chunks, len(kept)::BIGINT AS n_kept,
           list_sum(list_transform(kept,
             j -> least(8 * j, n) - (j - 1) * 8))::BIGINT AS n_tokens_kept,
           md5(array_to_string(list_transform(kept, j -> texts[j]), ' '))
             AS scrub_hash
    FROM k ORDER BY doc_id
