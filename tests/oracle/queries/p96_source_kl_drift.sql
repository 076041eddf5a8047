WITH t AS (
      SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE source IN ('src0', 'src1')),
    c AS (SELECT source, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
    a AS (SELECT tok, cnt AS ca FROM c WHERE source = 'src0'),
    b AS (SELECT tok, cnt AS cb FROM c WHERE source = 'src1'),
    j AS (
      SELECT COALESCE(a.tok, b.tok) AS tok,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.tok = b.tok),
    tt AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS v FROM j),
    sm AS (
      SELECT (ca + 0.5) / (ta + 0.5 * v) AS pa,
             (cb + 0.5) / (tb + 0.5 * v) AS pb
      FROM j, tt)
    SELECT COUNT(*)::BIGINT AS vocab,
           ROUND(SUM(pa * LN(pa / pb)), 6) AS kl_ab,
           ROUND(SUM(pb * LN(pb / pa)), 6) AS kl_ba
    FROM sm
