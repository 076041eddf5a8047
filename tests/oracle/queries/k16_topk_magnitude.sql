SELECT l_partkey, ROUND(g / 1000, 6) AS g_k
    FROM (
      SELECT l_partkey, SUM(l_extendedprice * l_discount) AS g
      FROM lineitem GROUP BY l_partkey
    ) t
    ORDER BY ABS(g) DESC, l_partkey
    LIMIT 20
