WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey),
    seg AS (
      SELECT c_mktsegment, spend,
             AVG(spend) OVER (PARTITION BY c_mktsegment) AS seg_avg
      FROM customer JOIN spend ON c_custkey = o_custkey)
    SELECT c_mktsegment, COUNT(*)::BIGINT AS n_above,
           ROUND(MAX(spend) / 1000, 3) AS max_spend_k
    FROM seg WHERE spend > seg_avg
    GROUP BY c_mktsegment ORDER BY c_mktsegment
