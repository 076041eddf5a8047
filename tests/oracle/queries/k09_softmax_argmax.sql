SELECT l_orderkey, l_linenumber,
           ROUND(EXP(lp1 - m) / (EXP(lp1 - m) + EXP(lp2 - m) + EXP(lp3 - m)), 6) AS p1,
           ROUND(EXP(lp2 - m) / (EXP(lp1 - m) + EXP(lp2 - m) + EXP(lp3 - m)), 6) AS p2,
           CASE WHEN lp1 >= lp2 AND lp1 >= lp3 THEN 'c1'
                WHEN lp2 >= lp3 THEN 'c2' ELSE 'c3' END AS cls
    FROM (
      SELECT l_orderkey, l_linenumber,
             0.1 * l_quantity - 1.0 * l_discount AS lp1,
             0.05 * l_quantity + 2.0 * l_tax AS lp2,
             0.08 * l_quantity - 0.5 * l_tax AS lp3,
             GREATEST(0.1 * l_quantity - 1.0 * l_discount,
                      0.05 * l_quantity + 2.0 * l_tax,
                      0.08 * l_quantity - 0.5 * l_tax) AS m
      FROM lineitem
      WHERE l_orderkey < 40
    ) t
    ORDER BY l_orderkey, l_linenumber
