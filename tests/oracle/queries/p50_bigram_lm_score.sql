WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    eb AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram, toks[i] AS w1
      FROM w, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i)),
    bc AS (SELECT bigram, COUNT(*) AS c12 FROM eb GROUP BY bigram),
    uni AS (SELECT unnest(toks) AS tok FROM w),
    uc AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
    v AS (SELECT COUNT(*) AS v FROM uc)
    SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
           ROUND(AVG(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_logp
    FROM eb JOIN bc USING (bigram) JOIN uc ON eb.w1 = uc.tok, v
    GROUP BY doc_id ORDER BY doc_id
