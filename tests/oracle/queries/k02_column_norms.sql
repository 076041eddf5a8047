SELECT ROUND(SUM(ABS(l_extendedprice)) / 1000000, 6) AS l1_mm,
           ROUND(SQRT(SUM(l_extendedprice * l_extendedprice)) / 1000000, 6) AS l2_mm,
           ROUND(AVG(ABS(l_discount)), 6) AS l1_mean_disc
    FROM lineitem
