WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    cb AS (SELECT vec_id AS code_id, ev AS cv FROM e WHERE vec_id < 16),
    d0 AS (
      SELECT e.vec_id, s.sub, cb.code_id,
             [e.ev[s.sub*16 + i] - cb.cv[s.sub*16 + i]
              FOR i IN range(1, 17)] AS dv
      FROM e CROSS JOIN cb
      CROSS JOIN (SELECT unnest(range(4)) AS sub) s),
    d AS (
      SELECT vec_id, sub, code_id,
             ROUND(list_dot_product(dv, dv), 6) AS d2
      FROM d0),
    best AS (
      SELECT vec_id, sub, code_id, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY d2, code_id) AS rn
      FROM d)
,
    n AS (
      SELECT vec_id, ev, sqrt(list_dot_product(ev, ev)) AS nrm FROM e),
    s AS (
      SELECT vec_id AS seed_id, ev AS sv, nrm AS snrm FROM n
      WHERE vec_id < 16),
    xr AS (
      SELECT n.vec_id, s.seed_id,
             ROW_NUMBER() OVER (
               PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.ev, s.sv) / (n.nrm * s.snrm) DESC,
                        s.seed_id) AS rn
      FROM n, s),
    cells AS (SELECT vec_id, seed_id AS cell FROM xr WHERE rn = 1),
    qp AS (
      SELECT vec_id AS query_id, seed_id AS qcell FROM xr
      WHERE vec_id IN (0, 1, 2) AND rn <= 2),
    lut AS (
      SELECT vec_id AS query_id, sub, code_id,
             floor(d2 * 1e6 + 0.5)::BIGINT AS qm
      FROM d WHERE vec_id IN (0, 1, 2)),
    scored AS (
      SELECT q.query_id, b.vec_id, SUM(l.qm) AS dm
      FROM best b
      JOIN cells c ON b.vec_id = c.vec_id
      JOIN qp q ON c.cell = q.qcell AND b.vec_id <> q.query_id
      JOIN lut l ON l.query_id = q.query_id AND l.sub = b.sub
                AND l.code_id = b.code_id
      WHERE b.rn = 1
      GROUP BY q.query_id, b.vec_id),
    ranked AS (
      SELECT query_id, vec_id, ROUND(dm / 1e6, 6) AS approx_d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dm, vec_id) AS rn
      FROM scored)
    SELECT query_id, vec_id, approx_d2 FROM ranked WHERE rn <= 5
    ORDER BY query_id, approx_d2, vec_id
