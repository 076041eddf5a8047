WITH med AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN d.adev > 3.0 * mad.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers,
           ROUND(MAX(d.med), 6) AS median,
           ROUND(MAX(mad.mad), 6) AS mad
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type ORDER BY d.event_type
