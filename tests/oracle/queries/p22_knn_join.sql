WITH q AS (
      SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_dot_product(ev, qv)
                   / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
      FROM e, q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS rk
      FROM scored)
    SELECT query_id, vec_id, cos FROM ranked WHERE rk <= 5
    ORDER BY query_id, cos DESC, vec_id
