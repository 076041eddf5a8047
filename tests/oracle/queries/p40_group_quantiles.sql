SELECT event_type, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
           unnest(percentile_disc([0.25, 0.5, 0.75, 0.9])
                  WITHIN GROUP (ORDER BY value)) AS value
    FROM events GROUP BY event_type
    ORDER BY event_type, q
