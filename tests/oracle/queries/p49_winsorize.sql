WITH b AS (
      SELECT o_orderpriority,
             percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS lo_v,
             percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS hi_v
      FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderpriority, COUNT(*)::BIGINT AS n,
           ROUND(SUM(o_totalprice) / 1000, 4) AS sum_raw_k,
           ROUND(SUM(least(greatest(o_totalprice, lo_v), hi_v)) / 1000, 4)
             AS sum_wins_k
    FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
