WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents)
    SELECT doc_id,
           (list_sum(list_transform(range(1, len(toks) + 1),
             i -> ((('0x' || substr(md5(toks[i]), 1, 15))::BIGINT) % 1000000000) * i))
            % 2147483648)::BIGINT AS fingerprint
    FROM w ORDER BY doc_id
