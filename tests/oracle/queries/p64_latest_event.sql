WITH r AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC,
                                         event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id, event_type, ROUND(value, 2) AS value
    FROM r WHERE rn = 1 ORDER BY user_id
