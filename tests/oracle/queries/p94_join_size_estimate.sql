WITH ka AS (SELECT DISTINCT (('0x' || substr(md5(concat_ws('_', CAST(o_orderkey AS VARCHAR), '0')), 1, 15))::BIGINT) AS h FROM orders
                ORDER BY h LIMIT 128),
    kb AS (SELECT DISTINCT (('0x' || substr(md5(concat_ws('_', CAST(l_orderkey AS VARCHAR), '0')), 1, 15))::BIGINT) AS h FROM lineitem
           ORDER BY h LIMIT 128),
    ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL
                                   SELECT h FROM kb)
           ORDER BY h LIMIT 128),
    inboth AS (SELECT ka.h FROM ka JOIN kb USING (h)),
    comp AS (
      SELECT (SELECT MAX(h) FROM ka) AS kth_a, (SELECT COUNT(*) FROM ka) AS na_k,
             (SELECT MAX(h) FROM kb) AS kth_b, (SELECT COUNT(*) FROM kb) AS nb_k,
             (SELECT MAX(h) FROM ku) AS kth_u, (SELECT COUNT(*) FROM ku) AS nu_k,
             (SELECT COUNT(*) FROM ku JOIN inboth USING (h)) AS p,
             (SELECT COUNT(*) FROM orders) AS rows_a,
             (SELECT COUNT(*) FROM lineitem) AS rows_b,
             (SELECT COUNT(*) FROM orders a JOIN lineitem b
              ON a.o_orderkey = b.l_orderkey) AS exact_join_rows),
    est AS (
      SELECT 128::BIGINT AS k,
             ROUND(CASE WHEN na_k < 128 THEN na_k::DOUBLE ELSE (127.0 * 1.152921504606847e+18) / kth_a::DOUBLE END, 6) AS est_keys_a,
             ROUND(CASE WHEN nb_k < 128 THEN nb_k::DOUBLE ELSE (127.0 * 1.152921504606847e+18) / kth_b::DOUBLE END, 6) AS est_keys_b,
             ROUND(CASE WHEN nu_k < 128 THEN nu_k::DOUBLE ELSE (127.0 * 1.152921504606847e+18) / kth_u::DOUBLE END, 6) AS est_union,
             ROUND(p::DOUBLE / least(nu_k, 128)::DOUBLE, 6) AS jaccard,
             rows_a, rows_b, exact_join_rows
      FROM comp)
    SELECT k, est_keys_a, est_keys_b, est_union, jaccard,
           ROUND(jaccard * est_union * (rows_a::DOUBLE / est_keys_a)
                 * (rows_b::DOUBLE / est_keys_b), 3) AS est_join_rows,
           exact_join_rows,
           CASE WHEN exact_join_rows > 0 THEN
             ROUND((ROUND(jaccard * est_union * (rows_a::DOUBLE / est_keys_a)
                          * (rows_b::DOUBLE / est_keys_b), 3)
                    - exact_join_rows) / exact_join_rows, 6)
           ELSE 0.0 END AS rel_err
    FROM est
