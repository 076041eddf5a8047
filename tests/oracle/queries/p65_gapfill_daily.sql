WITH daily AS (
      SELECT event_type, ts::DATE AS day, COUNT(*)::BIGINT AS n,
             SUM(value) AS sum_v
      FROM events GROUP BY event_type, day),
    span AS (SELECT MIN(ts::DATE) AS lo, MAX(ts::DATE) AS hi FROM events),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM span),
    groups AS (SELECT DISTINCT event_type FROM events)
    SELECT g.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n, 0)::BIGINT AS n,
           ROUND(COALESCE(d.sum_v, 0.0), 4) AS sum_v
    FROM spine s CROSS JOIN groups g
    LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = s.day
    ORDER BY g.event_type, s.day
