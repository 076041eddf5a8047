WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings)
    SELECT vec_id, j::BIGINT AS dim,
           ROUND(list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + j * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)), 6) AS proj
    FROM e, range(0, 16) t(j)
    ORDER BY vec_id, dim
