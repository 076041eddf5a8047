SELECT c_mktsegment, COUNT(*)::BIGINT AS n_inactive,
           MIN(c_custkey) AS min_key
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
