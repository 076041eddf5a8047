WITH b AS (
      SELECT o_orderpriority, o_totalprice,
             NTILE(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS tile
      FROM orders)
    SELECT o_orderpriority, tile, COUNT(*)::BIGINT AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM b GROUP BY o_orderpriority, tile
    ORDER BY o_orderpriority, tile
