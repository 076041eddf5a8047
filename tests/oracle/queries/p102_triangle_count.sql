WITH parts AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
      WHERE l_orderkey % 20 = 0),
    und AS (
      SELECT DISTINCT LEAST(a.p, b.p) AS a, GREATEST(a.p, b.p) AS b
      FROM parts a JOIN parts b ON a.k = b.k AND a.p <> b.p),
    wedges AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1 JOIN und e2 ON e1.b = e2.a),
    closed AS (
      SELECT w.* FROM wedges w
      WHERE EXISTS (SELECT 1 FROM und e WHERE e.a = w.x AND e.b = w.z))
    SELECT (SELECT COUNT(*) FROM und)::BIGINT AS n_edges,
           (SELECT COUNT(*) FROM wedges)::BIGINT AS n_wedges,
           (SELECT COUNT(*) FROM closed)::BIGINT AS n_triangles
