SELECT ROUND(LN(p / (1 - p)), 6) AS b0
    FROM (
      SELECT LEAST(GREATEST(AVG(CASE WHEN l_returnflag = 'R' THEN CAST(1.0 AS DOUBLE)
                                     ELSE CAST(0.0 AS DOUBLE) END), 1e-9), 1 - 1e-9) AS p
      FROM lineitem
    ) t
