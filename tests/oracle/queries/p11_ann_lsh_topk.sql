WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    sig AS (
      SELECT vec_id, ev, (CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 0 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 1 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 1 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 2 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 2 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 4 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 3 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 8 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 4 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 16 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 5 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 32 ELSE 0 END)::BIGINT AS bucket FROM e),
    q AS (
      SELECT vec_id AS query_id, ev AS qv, bucket AS qbucket
      FROM sig WHERE vec_id IN (0, 1, 2)),
    scored AS (
      SELECT q.query_id, s.vec_id,
             ROUND(list_dot_product(s.ev, q.qv)
                   / (sqrt(list_dot_product(s.ev, s.ev)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
      FROM sig s JOIN q ON s.bucket = q.qbucket AND s.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
    SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 5
    ORDER BY query_id, cos DESC, vec_id
