SELECT * FROM (
(WITH s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(l_extendedprice) AS x1, SUM(l_extendedprice*l_extendedprice) AS xx1, SUM(l_extendedprice*CAST(l_linenumber AS DOUBLE)) AS xy1_0, SUM(l_discount) AS x2, SUM(l_discount*l_discount) AS xx2, SUM(l_discount*CAST(l_linenumber AS DOUBLE)) AS xy2_0, SUM(l_tax) AS x3, SUM(l_tax*l_tax) AS xx3, SUM(l_tax*CAST(l_linenumber AS DOUBLE)) AS xy3_0, SUM(CAST(l_linenumber AS DOUBLE)) AS y0 FROM lineitem),
g AS (SELECT ABS((xy1_0 - x1*y0/n) / SQRT(xx1 - x1*x1/n)) AS gv FROM s UNION ALL SELECT ABS((xy2_0 - x2*y0/n) / SQRT(xx2 - x2*x2/n)) AS gv FROM s UNION ALL SELECT ABS((xy3_0 - x3*y0/n) / SQRT(xx3 - x3*x3/n)) AS gv FROM s),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (CASE rn WHEN 1 THEN 2.1280452341849827 WHEN 2 THEN 3.9619598700008973 WHEN 3 THEN 5.60681349695237 END)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3, 0.0 AS dev_ratio)
UNION ALL
(SELECT 0 AS path_idx, 1.0 AS sigma, 1.389082 AS b0, 0.0 AS b1, 0.0 AS b2, -0.036956 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.3890816944111524 + 0.0*l_extendedprice + 0.0*l_discount + -0.0369556331834595*l_tax) - EXP((1.3890816944111524 + 0.0*l_extendedprice + 0.0*l_discount + -0.0369556331834595*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 1 AS path_idx, 0.7 AS sigma, 1.390187 AS b0, 0.0 AS b1, 0.0 AS b2, -0.064666 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.390187265651714 + 0.0*l_extendedprice + 0.0*l_discount + -0.06466590033934334*l_tax) - EXP((1.390187265651714 + 0.0*l_extendedprice + 0.0*l_discount + -0.06466590033934334*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 2 AS path_idx, 0.4 AS sigma, 1.392024 AS b0, 0.0 AS b1, -0.014609 AS b2, -0.092422 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.3920236484730855 + 0.0*l_extendedprice + -0.01460894918267729*l_discount + -0.09242157898959943*l_tax) - EXP((1.3920236484730855 + 0.0*l_extendedprice + -0.01460894918267729*l_discount + -0.09242157898959943*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 3 AS path_idx, 0.2 AS sigma, 1.393406 AS b0, 0.0 AS b1, -0.027516 AS b2, -0.110935 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.3934058438093222 + 0.0*l_extendedprice + -0.02751629399542566*l_discount + -0.11093533416989163*l_tax) - EXP((1.3934058438093222 + 0.0*l_extendedprice + -0.02751629399542566*l_discount + -0.11093533416989163*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 4 AS path_idx, 0.1 AS sigma, 1.394097 AS b0, 0.0 AS b1, -0.03397 AS b2, -0.120192 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.394096766581224 + 0.0*l_extendedprice + -0.033969992805916*l_discount + -0.12019225403031174*l_tax) - EXP((1.394096766581224 + 0.0*l_extendedprice + -0.033969992805916*l_discount + -0.12019225403031174*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 5 AS path_idx, 0.05 AS sigma, 1.394442 AS b0, 0.0 AS b1, -0.037197 AS b2, -0.124821 AS b3, ROUND(1.0 - (-SUM(l_linenumber*(1.3944422279718798 + 0.0*l_extendedprice + -0.037196842182402434*l_discount + -0.12482071412610267*l_tax) - EXP((1.3944422279718798 + 0.0*l_extendedprice + -0.037196842182402434*l_discount + -0.12482071412610267*l_tax)) - LGAMMA(l_linenumber + 1.0))) / (COUNT(*) + SUM(LGAMMA(l_linenumber + 1.0))), 6) + 0.0 AS dev_ratio FROM lineitem)
) ORDER BY path_idx
