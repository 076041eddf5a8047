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
    lut AS (
      SELECT vec_id AS query_id, sub, code_id,
             floor(d2 * 1e6 + 0.5)::BIGINT AS qm
      FROM d WHERE vec_id IN (0, 1, 2)),
    scored AS (
      SELECT l.query_id, b.vec_id, SUM(l.qm) AS dm
      FROM best b JOIN lut l ON b.sub = l.sub AND b.code_id = l.code_id
      WHERE b.rn = 1 AND b.vec_id <> l.query_id
      GROUP BY l.query_id, b.vec_id),
    ranked AS (
      SELECT query_id, vec_id, ROUND(dm / 1e6, 6) AS approx_d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dm, vec_id) AS rn
      FROM scored)
    SELECT query_id, vec_id, approx_d2 FROM ranked WHERE rn <= 5
    ORDER BY query_id, approx_d2, vec_id
