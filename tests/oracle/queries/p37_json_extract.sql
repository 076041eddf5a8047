WITH e AS (
      SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type, COUNT(*)::BIGINT AS n,
           ROUND(AVG(k::DOUBLE), 6) AS avg_k,
           ROUND(SUM(value * k), 4) AS sum_vk
    FROM e GROUP BY event_type ORDER BY event_type
