SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS run_n,
           ROUND(SUM(o_totalprice) OVER w, 2) AS run_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
