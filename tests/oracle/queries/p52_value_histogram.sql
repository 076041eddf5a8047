WITH b AS (
      SELECT least(greatest(floor(value / 25.0), 0), 19)::BIGINT AS bin,
             value
      FROM events)
    SELECT bin, ROUND(bin * 25.0, 6) AS bin_lo, COUNT(*)::BIGINT AS n,
           ROUND(SUM(value), 4) AS sum_v
    FROM b GROUP BY bin ORDER BY bin
