WITH s AS (
      SELECT ((('0x' || substr(md5(doc_id::VARCHAR || '_0'), 1, 15))::BIGINT)) % 16
               AS shard,
             doc_id, n_chars
      FROM documents),
    per AS (
      SELECT shard, COUNT(*)::BIGINT AS n_rows,
             SUM(n_chars)::BIGINT AS sum_weight,
             MIN(doc_id) AS min_key, MAX(doc_id) AS max_key
      FROM s GROUP BY shard),
    tot AS (SELECT SUM(n_rows) AS t FROM per)
    SELECT shard, n_rows, sum_weight, min_key, max_key,
           (n_rows * 1000000 // t)::BIGINT AS load_ppm
    FROM per, tot
    ORDER BY shard
