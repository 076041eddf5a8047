WITH parts AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
      WHERE l_orderkey % 20 = 0),
    und0 AS (
      SELECT DISTINCT LEAST(a.p, b.p) AS a, GREATEST(a.p, b.p) AS b
      FROM parts a JOIN parts b ON a.k = b.k AND a.p <> b.p),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM und0 UNION ALL SELECT b FROM und0)
      GROUP BY node),
    und AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                  THEN u.a ELSE u.b END AS a,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                  THEN u.b ELSE u.a END AS b
      FROM und0 u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b),
    closed AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1 JOIN und e2 ON e1.b = e2.a
      WHERE EXISTS (SELECT 1 FROM und e WHERE e.a = e1.a AND e.b = e2.b)),
    corners AS (
      SELECT x AS node FROM closed
      UNION ALL SELECT y FROM closed
      UNION ALL SELECT z FROM closed)
    SELECT node, COUNT(*)::BIGINT AS n_triangles
    FROM corners GROUP BY node
    ORDER BY n_triangles DESC, node LIMIT 20
