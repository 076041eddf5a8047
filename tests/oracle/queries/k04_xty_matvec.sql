SELECT ROUND(SUM(l_quantity * l_extendedprice) / 1000000, 4) AS g_qty,
           ROUND(SUM(l_discount * l_extendedprice) / 1000000, 6) AS g_disc,
           ROUND(SUM(l_tax * l_extendedprice) / 1000000, 6) AS g_tax
    FROM lineitem
