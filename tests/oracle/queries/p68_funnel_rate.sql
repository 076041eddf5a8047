WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    conv AS (
      SELECT DISTINCT c.event_id
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE)
    SELECT (SELECT COUNT(*) FROM c)::BIGINT AS n_clicks,
           (SELECT COUNT(*) FROM conv)::BIGINT AS n_converted,
           ROUND((SELECT COUNT(*) FROM conv)::DOUBLE
                 / (SELECT COUNT(*) FROM c), 6) AS conversion_rate
