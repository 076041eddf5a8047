WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(ceil(greatest(len(toks) - 8, 1) / 24.0) AS INT) AS n_chunks
      FROM w),
    u AS (
      SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id::BIGINT AS chunk_id,
           len(list_slice(toks, chunk_id * 24 + 1,
                          least(chunk_id * 24 + 32, n)))::BIGINT AS chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_id * 24 + 1,
                                          least(chunk_id * 24 + 32, n)), ' '))
             AS chunk_hash
    FROM u ORDER BY doc_id, chunk_id
