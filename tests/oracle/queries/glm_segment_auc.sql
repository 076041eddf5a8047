WITH s AS (
      SELECT l_linestatus AS seg,
             CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END AS pos,
             1.0 / (1.0 + EXP(-(0.7040438221897719 + 0.00020013477765335388*l_quantity + -1.6834935168007775e-07*l_extendedprice + -0.21004370145502363*l_discount))) AS prob
      FROM lineitem),
    g AS (
      SELECT seg, prob, COUNT(*)::DOUBLE AS n_v, SUM(pos) AS n1_v
      FROM s GROUP BY seg, prob),
    c AS (
      SELECT seg, n_v, n1_v,
             SUM(n_v - n1_v) OVER (PARTITION BY seg ORDER BY prob
                                   ROWS UNBOUNDED PRECEDING)
               - (n_v - n1_v) AS below0
      FROM g)
    SELECT seg AS segment, SUM(n1_v) AS n_pos, SUM(n_v - n1_v) AS n_neg,
           ROUND(SUM(n1_v * below0 + 0.5 * n1_v * (n_v - n1_v))
                 / (SUM(n1_v) * SUM(n_v - n1_v)), 6) AS auc
    FROM c GROUP BY seg ORDER BY segment
