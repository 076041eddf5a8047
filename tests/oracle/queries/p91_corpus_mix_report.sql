WITH per AS (
      SELECT source, lang, COUNT(*)::BIGINT AS n_docs,
             SUM(n_chars)::BIGINT AS mass
      FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, mass,
           ROUND(mass::DOUBLE / (SELECT SUM(mass) FROM per)::DOUBLE, 6)
             AS share
    FROM per ORDER BY source, lang
