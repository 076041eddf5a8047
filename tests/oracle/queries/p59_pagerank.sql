WITH parts AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT DISTINCT a.p AS src, b.p AS dst
      FROM parts a JOIN parts b ON a.k = b.k AND a.p <> b.p),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn),
    c1 AS (
      SELECT e.dst, SUM(r.pr / d.deg) AS inflow
      FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r0 r ON r.node = e.src
      GROUP BY e.dst),
    d1 AS (
      SELECT COALESCE(SUM(r.pr), 0.0) AS dmass
      FROM r0 r LEFT JOIN deg d ON r.node = d.src WHERE d.src IS NULL),
    r1 AS (
      SELECT nodes.node,
             (0.15 + 0.85 * dmass) / n + 0.85 * COALESCE(inflow, 0.0) AS pr
      FROM nodes LEFT JOIN c1 ON c1.dst = nodes.node, nn, d1),
    c2 AS (
      SELECT e.dst, SUM(r.pr / d.deg) AS inflow
      FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r1 r ON r.node = e.src
      GROUP BY e.dst),
    d2 AS (
      SELECT COALESCE(SUM(r.pr), 0.0) AS dmass
      FROM r1 r LEFT JOIN deg d ON r.node = d.src WHERE d.src IS NULL),
    r2 AS (
      SELECT nodes.node,
             (0.15 + 0.85 * dmass) / n + 0.85 * COALESCE(inflow, 0.0) AS pr
      FROM nodes LEFT JOIN c2 ON c2.dst = nodes.node, nn, d2)
    SELECT node AS l_partkey, ROUND(pr * 1e6, 4) AS pr_ppm
    FROM r2
    ORDER BY pr_ppm DESC, l_partkey LIMIT 20
