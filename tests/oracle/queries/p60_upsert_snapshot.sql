WITH src AS (
      SELECT *, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    base AS (
      SELECT o_orderkey, o_orderstatus, cents, 0 AS ver,
             'upsert' AS op, 0 AS src
      FROM src),
    changes AS (
      SELECT o_orderkey, o_orderstatus,
             (cents * 11 + 5) // 10 AS cents, 1 AS ver,
             CASE WHEN o_orderkey % 100 = 0 THEN 'delete'
                  ELSE 'upsert' END AS op, 1 AS src
      FROM src
      WHERE o_orderkey % 2 = 1 OR o_orderkey % 100 = 0),
    merged AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY ver DESC, src DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM changes))
    SELECT o_orderstatus, COUNT(*)::BIGINT AS n,
           ROUND(SUM(cents) / 100000.0, 3) AS sum_k,
           SUM(ver)::BIGINT AS n_changed
    FROM merged WHERE rn = 1 AND op <> 'delete'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
