SELECT ROUND(GREATEST(MAX(cum), 0.0) / 1000, 6) AS infeas_k
    FROM (
      SELECT SUM(g - 50.0) OVER (ORDER BY g DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT l_partkey, ABS(SUM(l_extendedprice * l_discount)) / 1000 AS g
        FROM lineitem GROUP BY l_partkey
      ) gg
    ) c
