SELECT ROUND(AVG(CASE WHEN (o_totalprice > 150000) <> (o_orderpriority = '1-URGENT')
                          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6) AS misclass
    FROM orders
