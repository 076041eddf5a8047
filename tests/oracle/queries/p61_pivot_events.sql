SELECT (user_id % 10)::BIGINT AS bucket,
           COUNT(*) FILTER (WHERE event_type = 'click')::BIGINT AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')::BIGINT AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')::BIGINT AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')::BIGINT AS view
    FROM events GROUP BY bucket ORDER BY bucket
