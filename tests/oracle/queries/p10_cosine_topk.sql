WITH q AS (
      SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           ROUND(list_dot_product(ev, qv)
                 / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
    FROM e, q
    ORDER BY cos DESC, vec_id
    LIMIT 10
