WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev
      FROM events),
    s AS (
      SELECT user_id,
             SUM(CASE WHEN prev IS NULL OR ts_ms - prev > 600000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_ms
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
      FROM e)
    SELECT user_id,
           (MAX(session_id) + 1)::BIGINT AS n_sessions,
           COUNT(*)::BIGINT AS n_events
    FROM s GROUP BY user_id ORDER BY user_id
