WITH hashed AS (
      SELECT (('0x' || substr(md5(concat_ws('_', CAST(l_partkey AS VARCHAR), '0')), 1, 15))::BIGINT) & 63 AS bucket,
             (('0x' || substr(md5(concat_ws('_', CAST(l_partkey AS VARCHAR), '0')), 1, 15))::BIGINT) >> 6 AS w
      FROM lineitem),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN w = 0 THEN 55
                 ELSE 55 - length(bin(w)) END)::INT AS reg
      FROM hashed GROUP BY bucket),
    sk AS (
      SELECT COUNT(*)::BIGINT AS n_hit,
             SUM(reg)::BIGINT AS sum_reg,
             SUM((1::BIGINT << (55 - reg)))::BIGINT AS inv_scaled
      FROM regs),
    ex AS (SELECT COUNT(DISTINCT l_partkey)::BIGINT AS exact_distinct
           FROM lineitem),
    est AS (
      SELECT 64::BIGINT AS m, n_hit, sum_reg, inv_scaled, exact_distinct,
             inv_scaled::DOUBLE / 3.602879701896397e+16
               + (64 - n_hit)::DOUBLE AS inv_total,
             (64 - n_hit)::DOUBLE AS v
      FROM sk, ex)
    SELECT m, n_hit, sum_reg, inv_scaled,
           ROUND(CASE WHEN 2904.064 / inv_total <= 160.0 AND v > 0
                 THEN 64.0 * ln(64.0 / v)
                 ELSE 2904.064 / inv_total END, 4) AS est_distinct,
           exact_distinct,
           ROUND((CASE WHEN 2904.064 / inv_total <= 160.0 AND v > 0
                  THEN 64.0 * ln(64.0 / v)
                  ELSE 2904.064 / inv_total END - exact_distinct)
                 / exact_distinct, 4) AS rel_err
    FROM est
