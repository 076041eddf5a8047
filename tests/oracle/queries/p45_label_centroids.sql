WITH ex AS (
      SELECT label, vec_id, i::BIGINT AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    cent AS (
      SELECT label, pos, ROUND(AVG(val), 6) AS cval
      FROM ex GROUP BY label, pos),
    pv AS (
      SELECT ex.label, ex.vec_id,
             SUM(val * cval) AS dot,
             SQRT(SUM(val * val)) AS vnorm,
             SQRT(SUM(cval * cval)) AS cnorm
      FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
      GROUP BY ex.label, ex.vec_id)
    SELECT label, COUNT(*)::BIGINT AS n_members,
           ROUND(MAX(cnorm), 6) AS centroid_norm,
           ROUND(SUM(ROUND(dot / (vnorm * cnorm) * 1e6, 0)::BIGINT)
                 / (COUNT(*) * 1e6), 6) AS avg_cos
    FROM pv GROUP BY label ORDER BY label
