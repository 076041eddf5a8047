WITH s AS (
      SELECT least(floor((1.0 / (1.0 + EXP(-(0.7040438221897719 + 0.00020013477765335388*l_quantity + -1.6834935168007775e-07*l_extendedprice + -0.21004370145502363*l_discount)))) * 10), 9)::BIGINT AS bin,
             1.0 / (1.0 + EXP(-(0.7040438221897719 + 0.00020013477765335388*l_quantity + -1.6834935168007775e-07*l_extendedprice + -0.21004370145502363*l_discount))) AS prob,
             CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END AS pos
      FROM lineitem)
    SELECT bin, COUNT(*)::BIGINT AS n,
           ROUND(AVG(prob), 6) AS avg_pred,
           ROUND(AVG(pos), 6) AS emp_rate
    FROM s GROUP BY bin ORDER BY bin
