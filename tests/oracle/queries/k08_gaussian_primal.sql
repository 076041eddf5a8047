SELECT ROUND(0.5 * SUM(POW(l_quantity - 0.001 * l_extendedprice, 2)) / 1000000, 6) AS primal_m
    FROM lineitem
