WITH li AS (
      SELECT (l_orderkey % 3)::BIGINT AS hot, l_quantity FROM lineitem),
    dim AS (
      SELECT (event_id % 3)::BIGINT AS hot, ROUND(AVG(value), 6) AS dim_avg
      FROM events GROUP BY hot)
    SELECT li.hot, COUNT(*)::BIGINT AS n,
           ROUND(SUM(l_quantity * dim_avg), 4) AS weighted_qty
    FROM li JOIN dim ON li.hot = dim.hot
    GROUP BY li.hot ORDER BY li.hot
