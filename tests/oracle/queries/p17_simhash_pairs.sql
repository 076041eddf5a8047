WITH toks AS (
      SELECT doc_id, (('0x' || substr(md5(tok), 1, 15))::BIGINT) AS h
      FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok FROM documents)),
    bits AS (
      SELECT doc_id,
           SUM(CASE WHEN (h >> 0) % 2 = 1 THEN 1 ELSE -1 END) AS b0,
           SUM(CASE WHEN (h >> 1) % 2 = 1 THEN 1 ELSE -1 END) AS b1,
           SUM(CASE WHEN (h >> 2) % 2 = 1 THEN 1 ELSE -1 END) AS b2,
           SUM(CASE WHEN (h >> 3) % 2 = 1 THEN 1 ELSE -1 END) AS b3,
           SUM(CASE WHEN (h >> 4) % 2 = 1 THEN 1 ELSE -1 END) AS b4,
           SUM(CASE WHEN (h >> 5) % 2 = 1 THEN 1 ELSE -1 END) AS b5,
           SUM(CASE WHEN (h >> 6) % 2 = 1 THEN 1 ELSE -1 END) AS b6,
           SUM(CASE WHEN (h >> 7) % 2 = 1 THEN 1 ELSE -1 END) AS b7,
           SUM(CASE WHEN (h >> 8) % 2 = 1 THEN 1 ELSE -1 END) AS b8,
           SUM(CASE WHEN (h >> 9) % 2 = 1 THEN 1 ELSE -1 END) AS b9,
           SUM(CASE WHEN (h >> 10) % 2 = 1 THEN 1 ELSE -1 END) AS b10,
           SUM(CASE WHEN (h >> 11) % 2 = 1 THEN 1 ELSE -1 END) AS b11,
           SUM(CASE WHEN (h >> 12) % 2 = 1 THEN 1 ELSE -1 END) AS b12,
           SUM(CASE WHEN (h >> 13) % 2 = 1 THEN 1 ELSE -1 END) AS b13,
           SUM(CASE WHEN (h >> 14) % 2 = 1 THEN 1 ELSE -1 END) AS b14,
           SUM(CASE WHEN (h >> 15) % 2 = 1 THEN 1 ELSE -1 END) AS b15
      FROM toks GROUP BY doc_id),
    sh AS (
      SELECT b.doc_id, (CASE WHEN b0 > 0 THEN 1 ELSE 0 END + CASE WHEN b1 > 0 THEN 2 ELSE 0 END + CASE WHEN b2 > 0 THEN 4 ELSE 0 END + CASE WHEN b3 > 0 THEN 8 ELSE 0 END + CASE WHEN b4 > 0 THEN 16 ELSE 0 END + CASE WHEN b5 > 0 THEN 32 ELSE 0 END + CASE WHEN b6 > 0 THEN 64 ELSE 0 END + CASE WHEN b7 > 0 THEN 128 ELSE 0 END + CASE WHEN b8 > 0 THEN 256 ELSE 0 END + CASE WHEN b9 > 0 THEN 512 ELSE 0 END + CASE WHEN b10 > 0 THEN 1024 ELSE 0 END + CASE WHEN b11 > 0 THEN 2048 ELSE 0 END + CASE WHEN b12 > 0 THEN 4096 ELSE 0 END + CASE WHEN b13 > 0 THEN 8192 ELSE 0 END + CASE WHEN b14 > 0 THEN 16384 ELSE 0 END + CASE WHEN b15 > 0 THEN 32768 ELSE 0 END)::BIGINT AS simhash,
             d.lang, (d.n_chars // 100) AS len_bucket
      FROM bits b JOIN documents d USING (doc_id))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    ORDER BY doc_a, doc_b
