WITH f AS (
      SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem),
    s AS (
      SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem
      WHERE (('0x' || substr(md5(concat(l_orderkey::VARCHAR, '_3')), 1, 15))::BIGINT)
            < CAST(0.1 * 1152921504606846976 AS BIGINT)),
    ex AS (
      SELECT g, 0.5 AS q,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS exact_value
      FROM f GROUP BY g
      UNION ALL
      SELECT g, 0.9,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY v) FROM f GROUP BY g),
    sa AS (
      SELECT g, 0.5 AS q,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS sample_value
      FROM s GROUP BY g
      UNION ALL
      SELECT g, 0.9,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY v) FROM s GROUP BY g)
    SELECT g AS l_returnflag, q, exact_value, sample_value,
           ROUND(ABS(sample_value - exact_value) / exact_value, 6) AS rel_err
    FROM ex JOIN sa USING (g, q)
    ORDER BY l_returnflag, q
