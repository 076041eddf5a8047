WITH z AS (
      SELECT (((((l_partkey >> 0) & 1) << 0) + (((l_suppkey >> 0) & 1) << 1)) + ((((l_partkey >> 1) & 1) << 2) + (((l_suppkey >> 1) & 1) << 3)) + ((((l_partkey >> 2) & 1) << 4) + (((l_suppkey >> 2) & 1) << 5)) + ((((l_partkey >> 3) & 1) << 6) + (((l_suppkey >> 3) & 1) << 7)) + ((((l_partkey >> 4) & 1) << 8) + (((l_suppkey >> 4) & 1) << 9)) + ((((l_partkey >> 5) & 1) << 10) + (((l_suppkey >> 5) & 1) << 11)) + ((((l_partkey >> 6) & 1) << 12) + (((l_suppkey >> 6) & 1) << 13)) + ((((l_partkey >> 7) & 1) << 14) + (((l_suppkey >> 7) & 1) << 15)) + ((((l_partkey >> 8) & 1) << 16) + (((l_suppkey >> 8) & 1) << 17)) + ((((l_partkey >> 9) & 1) << 18) + (((l_suppkey >> 9) & 1) << 19)) + ((((l_partkey >> 10) & 1) << 20) + (((l_suppkey >> 10) & 1) << 21)) + ((((l_partkey >> 11) & 1) << 22) + (((l_suppkey >> 11) & 1) << 23))) AS zkey
      FROM lineitem)
    SELECT (zkey % 1024)::BIGINT AS zbucket, COUNT(*)::BIGINT AS n
    FROM z GROUP BY zbucket
    ORDER BY n DESC, zbucket LIMIT 20
