SELECT ROUND(-SUM(l_linenumber * (0.01 * l_quantity) - EXP(0.01 * l_quantity)) / 1000, 6) AS primal_k
    FROM lineitem
