WITH s AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END AS pos,
             1.0 / (1.0 + EXP(-(0.7040438221897719 + 0.00020013477765335388*l_quantity + -1.6834935168007775e-07*l_extendedprice + -0.21004370145502363*l_discount))) AS prob
      FROM lineitem),
    r AS (
      SELECT pos, prob,
             RANK() OVER (ORDER BY prob)
               + (COUNT(*) OVER (PARTITION BY prob) - 1) / 2.0 AS rnk
      FROM s)
    SELECT 0.02 AS sigma,
           ROUND((SUM(CASE WHEN pos = 1.0 THEN rnk ELSE 0.0 END)
                  - SUM(pos) * (SUM(pos) + 1) / 2.0)
                 / (SUM(pos) * (COUNT(*) - SUM(pos))), 6) AS auc,
           ROUND(AVG(POW(prob - pos, 2)), 6) AS mse,
           ROUND(AVG(CASE WHEN (prob > 0.5) <> (pos = 1.0)
                     THEN 1.0 ELSE 0.0 END), 6) AS misclass,
           ROUND(-2.0 * AVG(pos * LN(least(greatest(prob, 1e-15),
                                           1.0 - 1e-15))
                 + (1.0 - pos) * LN(1.0 - least(greatest(prob, 1e-15),
                                                1.0 - 1e-15))), 6)
             AS deviance
    FROM r
