SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(1 / (1 + EXP(-(0.01 * value - 1.0)))), 6) AS avg_score,
           ROUND(SUM(value) / 1000, 6) AS sum_value_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
