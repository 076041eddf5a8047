WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    p AS (
      SELECT doc_id,
             least(len(toks), 64) AS n_real,
             list_concat(
               toks[1:least(len(toks), 64)],
               list_transform(range(1, 64 - least(len(toks), 64) + 1),
                              i -> '<pad>')) AS padded
      FROM w)
    SELECT doc_id, n_real::BIGINT AS n_real,
           md5(array_to_string(padded, ' ')) AS ids_md5,
           n_real::BIGINT AS mask_sum
    FROM p ORDER BY doc_id
