SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity - (SELECT AVG(l_quantity) FROM lineitem), 6) AS yc
    FROM lineitem
    WHERE l_orderkey < 40
    ORDER BY l_orderkey, l_linenumber
