SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)'
           ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)'
           ELSE o_orderpriority END AS o_orderpriority,
           COUNT(*)::BIGINT AS n,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 / CAST(100000000.0 AS DOUBLE), 4) AS sum_mm
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus, o_orderpriority
