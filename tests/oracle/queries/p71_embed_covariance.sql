WITH ex AS (
      SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM embeddings),
    means AS (SELECT pos, AVG(val) AS mu FROM ex GROUP BY pos),
    c AS (
      SELECT vec_id, ex.pos, val - mu AS cv
      FROM ex JOIN means ON ex.pos = means.pos)
    SELECT a.pos::BIGINT AS i, b.pos::BIGINT AS j,
           ROUND(SUM(a.cv * b.cv) / (n - 1), 6) AS cov
    FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.pos <= b.pos, n
    WHERE a.pos < 4
    GROUP BY a.pos, b.pos, n.n
    ORDER BY i, j
