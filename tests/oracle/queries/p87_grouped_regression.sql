WITH ev AS (
      SELECT event_type,
             (floor(epoch(ts))::BIGINT
              - epoch(TIMESTAMP '2024-01-01 00:00:00')::BIGINT) AS xs,
             ROUND(value * 100, 0)::BIGINT AS yc FROM events),
    agg AS (
      SELECT event_type, COUNT(*)::BIGINT AS n,
             SUM(xs)::BIGINT AS sx, SUM(yc)::BIGINT AS sy,
             SUM(xs*xs)::BIGINT AS sxx, SUM(xs*yc)::BIGINT AS sxy,
             SUM(yc*yc)::BIGINT AS syy
      FROM ev GROUP BY event_type),
    f AS (
      SELECT event_type, n, n::DOUBLE AS nd, sx::DOUBLE AS sx,
             sy::DOUBLE AS sy, sxx::DOUBLE AS sxx, sxy::DOUBLE AS sxy,
             syy::DOUBLE AS syy
      FROM agg)
    SELECT event_type, n,
           ROUND((sxy - sx*sy/nd) / (sxx - sx*sx/nd) * 86400.0 / 100.0, 6)
             AS slope_per_day,
           ROUND((sy - (sxy - sx*sy/nd) / (sxx - sx*sx/nd) * sx)
                 / nd / 100.0, 4) AS intercept,
           ROUND(POW(sxy - sx*sy/nd, 2)
                 / ((sxx - sx*sx/nd) * (syy - sy*sy/nd)), 6) AS r2
    FROM f ORDER BY event_type
