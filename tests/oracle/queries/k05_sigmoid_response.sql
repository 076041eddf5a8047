SELECT l_orderkey, l_linenumber,
           ROUND(1 / (1 + EXP(-(0.1 * l_quantity - 2.0 * l_discount + 0.5 * l_tax))), 6) AS prob
    FROM lineitem
    WHERE l_orderkey < 40
    ORDER BY l_orderkey, l_linenumber
