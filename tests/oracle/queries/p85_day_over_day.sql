WITH daily AS (
      SELECT event_type, ts::DATE AS day, SUM(value) AS sum_v
      FROM events GROUP BY event_type, day),
    span AS (SELECT MIN(ts::DATE) AS lo, MAX(ts::DATE) AS hi FROM events),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM span),
    groups AS (SELECT DISTINCT event_type FROM events),
    filled AS (
      SELECT g.event_type, s.day, COALESCE(d.sum_v, 0.0) AS sum_v
      FROM spine s CROSS JOIN groups g
      LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = s.day)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(sum_v, 4) AS sum_v,
           ROUND(sum_v - COALESCE(LAG(sum_v) OVER (
             PARTITION BY event_type ORDER BY day), 0.0), 4) AS delta
    FROM filled ORDER BY event_type, day
