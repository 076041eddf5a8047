WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok FROM documents),
    d AS (
      SELECT tok, COUNT(*)::BIGINT AS df FROM toks GROUP BY tok),
    p AS (
      SELECT tok,
             array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 20),
                             ',') AS postings
      FROM toks GROUP BY tok)
    SELECT tok, df, postings FROM d JOIN p USING (tok) ORDER BY tok
