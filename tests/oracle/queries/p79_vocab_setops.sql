WITH a AS (
      SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE source = 'src0'),
    b AS (
      SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE source = 'src1')
    SELECT (SELECT COUNT(*) FROM (SELECT tok FROM a INTERSECT
                                  SELECT tok FROM b))::BIGINT AS n_inter,
           (SELECT COUNT(*) FROM (SELECT tok FROM a EXCEPT
                                  SELECT tok FROM b))::BIGINT AS n_only_a,
           (SELECT COUNT(*) FROM (SELECT tok FROM b EXCEPT
                                  SELECT tok FROM a))::BIGINT AS n_only_b
