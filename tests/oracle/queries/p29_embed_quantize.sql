WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    s AS (
      SELECT vec_id, ev,
             greatest(list_max(list_transform(ev, x -> abs(x))) / 127.0,
                      1e-12) AS scale
      FROM e),
    q AS (
      SELECT vec_id, scale, ev,
             list_transform(ev, x -> floor(x / scale + 0.5)::BIGINT) AS qs
      FROM s)
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           list_sum(list_transform(qs, x -> abs(x)))::BIGINT AS q_l1,
           ROUND(sqrt(list_sum(list_transform(range(1, len(ev) + 1),
                     i -> (ev[i] - qs[i] * scale) * (ev[i] - qs[i] * scale)))
                 / len(ev)), 6) AS rmse
    FROM q ORDER BY vec_id
