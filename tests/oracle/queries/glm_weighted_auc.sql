WITH s AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END AS pos,
             CAST(1 + l_orderkey % 7 AS DOUBLE) AS w,
             1.0 / (1.0 + EXP(-(0.7040438221897719 + 0.00020013477765335388*l_quantity + -1.6834935168007775e-07*l_extendedprice + -0.21004370145502363*l_discount))) AS prob
      FROM lineitem),
    g AS (
      SELECT prob, COUNT(*)::DOUBLE AS n_v, SUM(pos) AS n1_v,
             SUM(w) AS wt, SUM(w * pos) AS w1_v
      FROM s GROUP BY prob),
    c AS (
      SELECT n_v, n1_v, wt, w1_v,
             SUM(n_v - n1_v) OVER (ORDER BY prob ROWS UNBOUNDED PRECEDING)
               - (n_v - n1_v) AS below0,
             SUM(wt - w1_v) OVER (ORDER BY prob ROWS UNBOUNDED PRECEDING)
               - (wt - w1_v) AS wbelow0
      FROM g)
    SELECT 0.02 AS sigma,
           ROUND(SUM(n1_v * below0 + 0.5 * n1_v * (n_v - n1_v))
                 / (SUM(n1_v) * SUM(n_v - n1_v)), 6) AS auc,
           ROUND(SUM(w1_v * wbelow0 + 0.5 * w1_v * (wt - w1_v))
                 / (SUM(w1_v) * SUM(wt - w1_v)), 6) AS wauc
    FROM c
