SELECT * FROM (
(WITH ym AS (SELECT 1 AS one),
g AS (SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_linenumber - 1) UNION ALL SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_orderkey % 400) UNION ALL SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_partkey % 400)),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS dev_ratio, 0 AS n_nonzero)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.889172 AS dev_ratio, 0 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.889661 AS dev_ratio, 25 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.890562 AS dev_ratio, 0 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.890586 AS dev_ratio, 14 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.891117 AS dev_ratio, 0 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.891121 AS dev_ratio, 26 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
) ORDER BY path_idx
