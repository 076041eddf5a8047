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

    SELECT sub::BIGINT AS sub, code_id::BIGINT AS code,
           COUNT(*)::BIGINT AS n_assigned,
           SUM(vec_id)::BIGINT AS id_sum,
           SUM(floor(d2 * 1e6 + 0.5)::BIGINT)::BIGINT AS sse_micro
    FROM best WHERE rn = 1
    GROUP BY sub, code_id ORDER BY sub, code
