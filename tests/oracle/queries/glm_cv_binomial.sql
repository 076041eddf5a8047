SELECT * FROM (
(SELECT 0 AS fold, 0 AS path_idx, 0.1 AS sigma, 0.685032 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.6850319673280255 + 0.0*l_quantity + 0.0*l_extendedprice + 0.0*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 0)
UNION ALL
(SELECT 0 AS fold, 1 AS path_idx, 0.05 AS sigma, 0.685116 AS b0, 3e-06 AS b1, 0.0 AS b2, -0.001697 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.6851163397724808 + 3.4144149732756113e-06*l_quantity + -1.637939195491647e-09*l_extendedprice + -0.001696736280405619*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 0)
UNION ALL
(SELECT 1 AS fold, 0 AS path_idx, 0.1 AS sigma, 0.701047 AS b0, 0.000293 AS b1, 0.0 AS b2, 0.0 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.7010470946215126 + 0.0002931224094170499*l_quantity + -3.295927064965228e-07*l_extendedprice + 0.0*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 1)
UNION ALL
(SELECT 1 AS fold, 1 AS path_idx, 0.05 AS sigma, 0.70167 AS b0, 0.000436 AS b1, 0.0 AS b2, 0.0 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.7016704631288816 + 0.0004364636694791302*l_quantity + -4.093207674045929e-07*l_extendedprice + 0.0*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 1)
UNION ALL
(SELECT 2 AS fold, 0 AS path_idx, 0.1 AS sigma, 0.716689 AS b0, 0.0 AS b1, 0.0 AS b2, -0.471015 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.716688713895103 + 0.0*l_quantity + 0.0*l_extendedprice + -0.4710150725439347*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 2)
UNION ALL
(SELECT 2 AS fold, 1 AS path_idx, 0.05 AS sigma, 0.72086 AS b0, 0.0 AS b1, 0.0 AS b2, -0.553636 AS b3, ROUND(AVG(POW((1.0 / (1.0 + EXP(-(0.7208602410775343 + 0.0*l_quantity + 0.0*l_extendedprice + -0.5536357338006773*l_discount)))) - (CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END), 2)), 6) + 0.0 AS mse FROM lineitem WHERE CAST(MOD(MOD(l_orderkey * 2654435761, 4294967296), 3) AS BIGINT) = 2)
) ORDER BY fold, path_idx
