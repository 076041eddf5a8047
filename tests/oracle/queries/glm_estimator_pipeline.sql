WITH st AS (
  SELECT COUNT(*)::DOUBLE AS n,
         AVG(l_extendedprice) AS m1, AVG(l_discount) AS m2, AVG(l_tax) AS m3,
         AVG(l_quantity) AS my,
         SUM(l_extendedprice*l_extendedprice) AS s11, SUM(l_extendedprice*l_discount) AS s12,
         SUM(l_extendedprice*l_tax) AS s13, SUM(l_discount*l_discount) AS s22,
         SUM(l_discount*l_tax) AS s23, SUM(l_tax*l_tax) AS s33,
         SUM(l_extendedprice*l_quantity) AS c1s, SUM(l_discount*l_quantity) AS c2s,
         SUM(l_tax*l_quantity) AS c3s
  FROM lineitem),
ge AS (
  SELECT n, m1, m2, m3, my,
         s11 - n*m1*m1 AS a11, s12 - n*m1*m2 AS a12, s13 - n*m1*m3 AS a13,
         s22 - n*m2*m2 AS a22, s23 - n*m2*m3 AS a23, s33 - n*m3*m3 AS a33,
         c1s - n*m1*my AS c1, c2s - n*m2*my AS c2, c3s - n*m3*my AS c3
  FROM st),
de AS (
  SELECT *, a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
            + a13*(a12*a23 - a22*a13) AS det FROM ge),
bs AS (
  SELECT my, m1, m2, m3,
    (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3) + a13*(c2*a23 - a22*c3)) / det AS b1,
    (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13) + a13*(a12*c3 - c2*a13)) / det AS b2,
    (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13) + c1*(a12*a23 - a22*a13)) / det AS b3
  FROM de),
bb AS (SELECT my - m1*b1 - m2*b2 - m3*b3 AS b0, b1, b2, b3 FROM bs)
    SELECT l_returnflag, COUNT(*)::BIGINT AS n,
           floor(AVG((bb.b0 + bb.b1*l_extendedprice + bb.b2*l_discount + bb.b3*l_tax)) * 1e6 + 0.5)::BIGINT AS avg_pred_micro,
           floor(AVG(ABS(l_quantity - (bb.b0 + bb.b1*l_extendedprice + bb.b2*l_discount + bb.b3*l_tax))) * 1e6 + 0.5)::BIGINT AS mae_micro
    FROM lineitem, bb
    GROUP BY l_returnflag ORDER BY l_returnflag
