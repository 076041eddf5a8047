WITH long AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS v
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
    SELECT l_returnflag, measure, COUNT(*)::BIGINT AS n,
           ROUND(AVG(v), 6) AS avg_v
    FROM long GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
