SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN '(all)'
           ELSE l_returnflag END AS l_returnflag,
           CASE WHEN GROUPING(l_linestatus) = 1 THEN '(all)'
           ELSE l_linestatus END AS l_linestatus,
           COUNT(*)::BIGINT AS n,
           ROUND(SUM(l_quantity) / 1000, 4) AS sum_qty_k,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) / 1000000, 4) AS rev_mm
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
