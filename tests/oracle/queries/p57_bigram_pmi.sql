WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    eb AS (
      SELECT toks[i] || ' ' || toks[i+1] AS bigram
      FROM w, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i)),
    bc AS (SELECT bigram, COUNT(*)::BIGINT AS c12 FROM eb GROUP BY bigram),
    uni AS (
      SELECT tok, COUNT(*)::BIGINT AS c
      FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok),
    tot AS (SELECT COUNT(*)::DOUBLE AS n_big FROM eb)
    SELECT bigram, c12, u1.c AS c1, u2.c AS c2,
           ROUND(ln(c12 * n_big / (u1.c * u2.c)), 6) AS pmi
    FROM bc
    JOIN uni u1 ON u1.tok = string_split(bigram, ' ')[1]
    JOIN uni u2 ON u2.tok = string_split(bigram, ' ')[2], tot
    WHERE c12 >= 5
    ORDER BY pmi DESC, bigram LIMIT 20
