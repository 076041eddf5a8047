WITH e AS (
      SELECT vec_id, label,
             ROUND(sqrt(list_dot_product(
               list_transform(embedding, x -> x::DOUBLE),
               list_transform(embedding, x -> x::DOUBLE))), 6) AS norm
      FROM embeddings),
    med AS (
      SELECT label,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY norm) AS m
      FROM e GROUP BY label),
    dev AS (
      SELECT e.*, ABS(norm - m) AS adev, m FROM e JOIN med USING (label)),
    mad AS (
      SELECT label,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY label)
    SELECT vec_id, label, norm,
           CASE WHEN ABS(norm - m) > 3.0 * mad THEN 1 ELSE 0 END
             AS is_outlier
    FROM dev JOIN mad USING (label)
    ORDER BY vec_id
