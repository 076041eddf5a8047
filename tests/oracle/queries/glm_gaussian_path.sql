SELECT * FROM (
(WITH s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(l_extendedprice) AS x1, SUM(l_extendedprice*l_extendedprice) AS xx1, SUM(l_extendedprice*l_quantity) AS xy1_0, SUM(l_discount) AS x2, SUM(l_discount*l_discount) AS xx2, SUM(l_discount*l_quantity) AS xy2_0, SUM(l_tax) AS x3, SUM(l_tax*l_tax) AS xx3, SUM(l_tax*l_quantity) AS xy3_0, SUM(l_quantity) AS y0 FROM lineitem),
g AS (SELECT ABS((xy1_0 - x1*y0/n) / SQRT(xx1 - x1*x1/n)) AS gv FROM s UNION ALL SELECT ABS((xy2_0 - x2*y0/n) / SQRT(xx2 - x2*x2/n)) AS gv FROM s UNION ALL SELECT ABS((xy3_0 - x3*y0/n) / SQRT(xx3 - x3*x3/n)) AS gv FROM s),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (CASE rn WHEN 1 THEN 2.1280452341849827 WHEN 2 THEN 3.9619598700008973 WHEN 3 THEN 5.60681349695237 END)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3, 0.0 AS dev_ratio)
UNION ALL
(SELECT 0 AS path_idx, 4.0 AS sigma, 25.356113 AS b0, 0.0 AS b1, 0.0 AS b2, 0.500164 AS b3, ROUND(1.0 - SUM(POW(l_quantity - (25.35611313556002 + 4.931660463182496e-07*l_extendedprice + -0.0*l_discount + 0.5001640127461369*l_tax), 2)) / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 1 AS path_idx, 2.0 AS sigma, 25.321863 AS b0, 1e-06 AS b1, -0.439801 AS b2, 1.136515 AS b3, ROUND(1.0 - SUM(POW(l_quantity - (25.321862836672786 + 1.0735914160788573e-06*l_extendedprice + -0.43980084255027374*l_discount + 1.136515070708334*l_tax), 2)) / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 2 AS path_idx, 1.0 AS sigma, 25.305364 AS b0, 1e-06 AS b1, -0.672292 AS b2, 1.454652 AS b3, ROUND(1.0 - SUM(POW(l_quantity - (25.305363524174567 + 1.36388390258992e-06*l_extendedprice + -0.6722920479367043*l_discount + 1.4546515902332993*l_tax), 2)) / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 3 AS path_idx, 0.5 AS sigma, 25.297114 AS b0, 2e-06 AS b1, -0.788538 AS b2, 1.61372 AS b3, ROUND(1.0 - SUM(POW(l_quantity - (25.297113867921794 + 1.5090301463307312e-06*l_extendedprice + -0.7885376513726151*l_discount + 1.613719850371285*l_tax), 2)) / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(SELECT 4 AS path_idx, 0.1 AS sigma, 25.290514 AS b0, 2e-06 AS b1, -0.881534 AS b2, 1.740974 AS b3, ROUND(1.0 - SUM(POW(l_quantity - (25.290514142882092 + 1.6251471420184088e-06*l_extendedprice + -0.8815341346806883*l_discount + 1.7409744591960632*l_tax), 2)) / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio FROM lineitem)
UNION ALL
(WITH st AS (
  SELECT COUNT(*)::DOUBLE AS n,
         AVG(l_extendedprice) AS m1, AVG(l_discount) AS m2, AVG(l_tax) AS m3,
         AVG(l_quantity) AS my,
         SUM(l_extendedprice*l_extendedprice) AS s11, SUM(l_extendedprice*l_discount) AS s12,
         SUM(l_extendedprice*l_tax) AS s13, SUM(l_discount*l_discount) AS s22,
         SUM(l_discount*l_tax) AS s23, SUM(l_tax*l_tax) AS s33,
         SUM(l_extendedprice*l_quantity) AS c1s, SUM(l_discount*l_quantity) AS c2s,
         SUM(l_tax*l_quantity) AS c3s
  FROM lineitem
), ge AS (
  SELECT n, m1, m2, m3, my,
         s11 - n*m1*m1 AS a11, s12 - n*m1*m2 AS a12, s13 - n*m1*m3 AS a13,
         s22 - n*m2*m2 AS a22, s23 - n*m2*m3 AS a23, s33 - n*m3*m3 AS a33,
         c1s - n*m1*my AS c1, c2s - n*m2*my AS c2, c3s - n*m3*my AS c3
  FROM st
), de AS (
  SELECT *, a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det
  FROM ge
), bs AS (
  SELECT my, m1, m2, m3,
    (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3) + a13*(c2*a23 - a22*c3)) / det AS b1,
    (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13) + a13*(a12*c3 - c2*a13)) / det AS b2,
    (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13) + c1*(a12*a23 - a22*a13)) / det AS b3
  FROM de
), bb AS (
  SELECT my - m1*b1 - m2*b2 - m3*b3 AS b0, b1, b2, b3 FROM bs
)
SELECT 5 AS path_idx, 0.0 AS sigma,
       ROUND(MIN(bb.b0), 6) + 0.0 AS b0, ROUND(MIN(bb.b1), 6) + 0.0 AS b1,
       ROUND(MIN(bb.b2), 6) + 0.0 AS b2, ROUND(MIN(bb.b3), 6) + 0.0 AS b3,
       ROUND(1.0 - SUM(POW(l_quantity - (bb.b0 + bb.b1*l_extendedprice + bb.b2*l_discount + bb.b3*l_tax), 2))
             / (SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*)), 6) + 0.0 AS dev_ratio
FROM lineitem, bb)
) ORDER BY path_idx
