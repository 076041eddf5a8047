WITH toks AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    sizes AS (SELECT source, COUNT(*)::BIGINT AS sz FROM toks GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*)::BIGINT AS n_inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT src_a, src_b,
           ROUND(n_inter::DOUBLE / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON src_a = sa.source
               JOIN sizes sb ON src_b = sb.source
    ORDER BY src_a, src_b
