WITH s AS (
      SELECT vec_id AS seed_id,
             list_transform(embedding, x -> x::DOUBLE) AS sv
      FROM embeddings WHERE vec_id < 8),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    scored AS (
      SELECT vec_id, seed_id,
             ROUND(list_dot_product(ev, sv)
                   / (sqrt(list_dot_product(ev, ev))
                      * sqrt(list_dot_product(sv, sv))), 6) AS cos
      FROM e, s),
    best AS (
      SELECT vec_id, seed_id, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, seed_id) AS rn
      FROM scored)
    SELECT seed_id, COUNT(*)::BIGINT AS n_assigned,
           ROUND(SUM(ROUND(cos * 1e6, 0)::BIGINT) / (COUNT(*) * 1e6), 6)
             AS mean_cos,
           ROUND((COUNT(*) * 1000000 - SUM(ROUND(cos * 1e6, 0)::BIGINT))
                 / 1e6, 6) AS inertia
    FROM best WHERE rn = 1
    GROUP BY seed_id ORDER BY seed_id
