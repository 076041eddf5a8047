SELECT ROUND((SUM(CASE WHEN pos = 1 THEN CAST(r AS DOUBLE) ELSE 0.0 END)
                  - (SUM(pos) * (SUM(pos) + 1)) / 2.0)
                 / (SUM(pos) * (COUNT(*) - SUM(pos))), 6) AS auc
    FROM (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r
      FROM orders
    ) t
