WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    counts AS (
      SELECT tok, COUNT(*)::DOUBLE AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*)::DOUBLE AS total FROM toks)
    SELECT doc_id,
           ROUND(AVG(LN(cnt / total)), 6) AS lm_logprob,
           COUNT(*)::BIGINT AS n_tokens
    FROM toks JOIN counts USING (tok), tot
    GROUP BY doc_id ORDER BY doc_id
