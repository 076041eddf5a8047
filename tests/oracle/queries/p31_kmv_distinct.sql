WITH hashes AS (
      SELECT DISTINCT (('0x' || substr(md5(concat_ws('_', CAST(l_partkey AS VARCHAR), '0')), 1, 15))::BIGINT) AS h FROM lineitem),
    kmin AS (SELECT h FROM hashes ORDER BY h LIMIT 64),
    est AS (
      SELECT 64::BIGINT AS k, MAX(h) AS kth_hash,
             ROUND(CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
                   ELSE (63.0 * 1.152921504606847e+18) / MAX(h)::DOUBLE END,
                   6) AS est_distinct
      FROM kmin),
    ex AS (SELECT COUNT(DISTINCT l_partkey)::BIGINT AS exact_distinct
           FROM lineitem)
    SELECT k, kth_hash, est_distinct, exact_distinct,
           ROUND((est_distinct - exact_distinct) / exact_distinct, 6)
             AS rel_err
    FROM est, ex
