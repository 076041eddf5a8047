SELECT ROUND(AVG(POW(o_totalprice / 100000 - 1.5, 2)), 6) AS mse,
           ROUND(AVG(ABS(o_totalprice / 100000 - 1.5)), 6) AS mae
    FROM orders
