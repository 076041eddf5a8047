WITH hashes AS (
      SELECT DISTINCT l_returnflag,
             (('0x' || substr(md5(l_partkey::VARCHAR || '_0'), 1, 15))::BIGINT) AS h
      FROM lineitem),
    kmin AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM hashes),
    est AS (
      SELECT l_returnflag, COUNT(*)::BIGINT AS n_kept, MAX(h) AS kth_hash,
             ROUND(CASE WHEN COUNT(*) < 32 THEN COUNT(*)::DOUBLE
                   ELSE (31.0 * 1.152921504606847e+18) / MAX(h)::DOUBLE END,
                   6) AS est_distinct
      FROM kmin WHERE rn <= 32 GROUP BY l_returnflag),
    ex AS (
      SELECT l_returnflag, COUNT(DISTINCT l_partkey)::BIGINT
               AS exact_distinct
      FROM lineitem GROUP BY l_returnflag)
    SELECT est.l_returnflag, n_kept, kth_hash, est_distinct, exact_distinct
    FROM est JOIN ex ON est.l_returnflag = ex.l_returnflag
    ORDER BY est.l_returnflag
