WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    sig AS (
      SELECT vec_id, ev, (CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 0 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 1 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 1 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 2 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 2 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 4 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 3 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 8 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 4 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 16 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 5 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 32 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 6 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 64 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 7 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 128 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 8 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 256 ELSE 0 END + CASE WHEN list_dot_product(ev, list_transform(range(0, 64), d -> CASE WHEN (d * 2654435761 + 9 * 40503) % 97 < 48 THEN 1.0 ELSE -1.0 END)) > 0 THEN 512 ELSE 0 END)::BIGINT AS bucket FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.ev, b.ev)
                 / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS cos
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.ev, b.ev)
          / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))) >= 0.95
    ORDER BY id_a, id_b
