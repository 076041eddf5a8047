WITH st_t0 AS (
  SELECT COUNT(*)::DOUBLE AS n,
         AVG(l_extendedprice) AS m1, AVG(l_tax) AS m2, AVG(l_linenumber) AS m3,
         AVG(l_quantity) AS my,
         SUM(l_extendedprice*l_extendedprice) AS s11, SUM(l_extendedprice*l_tax) AS s12,
         SUM(l_extendedprice*l_linenumber) AS s13, SUM(l_tax*l_tax) AS s22,
         SUM(l_tax*l_linenumber) AS s23, SUM(l_linenumber*l_linenumber) AS s33,
         SUM(l_extendedprice*l_quantity) AS c1s, SUM(l_tax*l_quantity) AS c2s,
         SUM(l_linenumber*l_quantity) AS c3s
  FROM lineitem),
ge_t0 AS (
  SELECT n, m1, m2, m3, my,
         s11 - n*m1*m1 AS a11, s12 - n*m1*m2 AS a12, s13 - n*m1*m3 AS a13,
         s22 - n*m2*m2 AS a22, s23 - n*m2*m3 AS a23, s33 - n*m3*m3 AS a33,
         c1s - n*m1*my AS c1, c2s - n*m2*my AS c2, c3s - n*m3*my AS c3
  FROM st_t0),
de_t0 AS (
  SELECT *, a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
            + a13*(a12*a23 - a22*a13) AS det
  FROM ge_t0),
bs_t0 AS (
  SELECT my, m1, m2, m3,
    (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3) + a13*(c2*a23 - a22*c3)) / det AS b1,
    (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13) + a13*(a12*c3 - c2*a13)) / det AS b2,
    (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13) + c1*(a12*a23 - a22*a13)) / det AS b3
  FROM de_t0),
bb_t0 AS (
  SELECT my - m1*b1 - m2*b2 - m3*b3 AS b0, b1, b2, b3 FROM bs_t0),
fitstat_t0 AS (
  SELECT SUM(POW(l_quantity - (bb_t0.b0 + bb_t0.b1*l_extendedprice
                           + bb_t0.b2*l_tax + bb_t0.b3*l_linenumber), 2)) AS rss,
         SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(*) AS tss
  FROM lineitem, bb_t0),
st_t1 AS (
  SELECT COUNT(*)::DOUBLE AS n,
         AVG(l_extendedprice) AS m1, AVG(l_tax) AS m2, AVG(l_linenumber) AS m3,
         AVG(l_discount) AS my,
         SUM(l_extendedprice*l_extendedprice) AS s11, SUM(l_extendedprice*l_tax) AS s12,
         SUM(l_extendedprice*l_linenumber) AS s13, SUM(l_tax*l_tax) AS s22,
         SUM(l_tax*l_linenumber) AS s23, SUM(l_linenumber*l_linenumber) AS s33,
         SUM(l_extendedprice*l_discount) AS c1s, SUM(l_tax*l_discount) AS c2s,
         SUM(l_linenumber*l_discount) AS c3s
  FROM lineitem),
ge_t1 AS (
  SELECT n, m1, m2, m3, my,
         s11 - n*m1*m1 AS a11, s12 - n*m1*m2 AS a12, s13 - n*m1*m3 AS a13,
         s22 - n*m2*m2 AS a22, s23 - n*m2*m3 AS a23, s33 - n*m3*m3 AS a33,
         c1s - n*m1*my AS c1, c2s - n*m2*my AS c2, c3s - n*m3*my AS c3
  FROM st_t1),
de_t1 AS (
  SELECT *, a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
            + a13*(a12*a23 - a22*a13) AS det
  FROM ge_t1),
bs_t1 AS (
  SELECT my, m1, m2, m3,
    (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3) + a13*(c2*a23 - a22*c3)) / det AS b1,
    (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13) + a13*(a12*c3 - c2*a13)) / det AS b2,
    (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13) + c1*(a12*a23 - a22*a13)) / det AS b3
  FROM de_t1),
bb_t1 AS (
  SELECT my - m1*b1 - m2*b2 - m3*b3 AS b0, b1, b2, b3 FROM bs_t1),
fitstat_t1 AS (
  SELECT SUM(POW(l_discount - (bb_t1.b0 + bb_t1.b1*l_extendedprice
                           + bb_t1.b2*l_tax + bb_t1.b3*l_linenumber), 2)) AS rss,
         SUM(l_discount*l_discount) - SUM(l_discount)*SUM(l_discount)/COUNT(*) AS tss
  FROM lineitem, bb_t1)
SELECT * FROM (
SELECT 'l_quantity' AS target, ROUND(bb_t0.b0, 6) + 0.0 AS b0, ROUND(bb_t0.b1, 6) + 0.0 AS b1, ROUND(bb_t0.b2, 6) + 0.0 AS b2, ROUND(bb_t0.b3, 6) + 0.0 AS b3, ROUND(1.0 - (fitstat_t0.rss + fitstat_t1.rss) / (fitstat_t0.tss + fitstat_t1.tss), 6) + 0.0 AS dev_ratio FROM bb_t0, fitstat_t0, fitstat_t1
UNION ALL
SELECT 'l_discount' AS target, ROUND(bb_t1.b0, 6) + 0.0 AS b0, ROUND(bb_t1.b1, 6) + 0.0 AS b1, ROUND(bb_t1.b2, 6) + 0.0 AS b2, ROUND(bb_t1.b3, 6) + 0.0 AS b3, ROUND(1.0 - (fitstat_t0.rss + fitstat_t1.rss) / (fitstat_t0.tss + fitstat_t1.tss), 6) + 0.0 AS dev_ratio FROM bb_t1, fitstat_t0, fitstat_t1
) ORDER BY target
