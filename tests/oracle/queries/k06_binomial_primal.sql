SELECT ROUND(SUM(LN(1 + EXP(-(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE -1.0 END)
                                  * (0.1 * l_quantity - 2.0 * l_discount)))) / 1000, 6) AS primal_k
    FROM lineitem
