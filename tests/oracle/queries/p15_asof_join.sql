WITH ev AS (
      SELECT event_id, user_id,
             (DATE '1997-06-01' + INTERVAL ((event_id % 365)::INT) DAY)::DATE AS event_date
      FROM events),
    ords AS (
      SELECT o_custkey AS user_id, o_orderdate::DATE AS odate,
             MAX(o_totalprice) AS best_price
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id,
           ROUND((SELECT o.best_price FROM ords o
                  WHERE o.user_id = e.user_id AND o.odate <= e.event_date
                  ORDER BY o.odate DESC LIMIT 1), 2) AS price_asof
    FROM ev e
    ORDER BY e.event_id
