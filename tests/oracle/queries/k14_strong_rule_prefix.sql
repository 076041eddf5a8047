SELECT CAST(COALESCE(MAX(rn), 0) AS BIGINT) AS prefix_k
    FROM (
      SELECT ROW_NUMBER() OVER (ORDER BY g DESC, l_partkey) AS rn,
             SUM(g - 55.0) OVER (ORDER BY g DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT l_partkey, ABS(SUM(l_extendedprice * l_discount)) / 1000 AS g
        FROM lineitem GROUP BY l_partkey
      ) gg
    ) c
    WHERE cum >= 0
