WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 4, 0) + 1),
               i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
      FROM w),
    cg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
    pg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 1),
    bits AS (
      SELECT DISTINCT unnest([(('0x' || substr(md5('b0_' || gram), 1, 15))::BIGINT) % 8192, (('0x' || substr(md5('b1_' || gram), 1, 15))::BIGINT) % 8192, (('0x' || substr(md5('b2_' || gram), 1, 15))::BIGINT) % 8192]) AS pos FROM cg),
    probe_pos AS (
      SELECT gram, unnest([(('0x' || substr(md5('b0_' || gram), 1, 15))::BIGINT) % 8192, (('0x' || substr(md5('b1_' || gram), 1, 15))::BIGINT) % 8192, (('0x' || substr(md5('b2_' || gram), 1, 15))::BIGINT) % 8192]) AS pos FROM pg),
    passes AS (
      SELECT gram FROM probe_pos JOIN bits USING (pos)
      GROUP BY gram HAVING COUNT(*) = 3),
    truth AS (SELECT gram FROM pg WHERE gram IN (SELECT gram FROM cg)),
    s AS (
      SELECT (SELECT COUNT(*) FROM bits) AS n_bits_set,
             (SELECT COUNT(*) FROM pg) AS n_probe,
             (SELECT COUNT(*) FROM truth) AS n_true,
             (SELECT COUNT(*) FROM passes) AS n_pass)
    SELECT 8192::BIGINT AS m_bits, 3::BIGINT AS depth,
           n_bits_set::BIGINT AS n_bits_set, n_probe::BIGINT AS n_probe,
           n_true::BIGINT AS n_true, n_pass::BIGINT AS n_pass,
           (n_pass - n_true)::BIGINT AS n_false_pos,
           ROUND((n_pass - n_true)::DOUBLE
                 / greatest(n_probe - n_true, 1)::DOUBLE, 6) AS fpr
    FROM s
