WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok FROM documents),
    sig0 AS (
      SELECT doc_id,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 506952114 + 0) % 2147483647) AS mh0,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 99338872 + 40503) % 2147483647) AS mh1,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 1119006270 + 81006) % 2147483647) AS mh2,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 668265263 + 121509) % 2147483647) AS mh3,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 374761393 + 162012) % 2147483647) AS mh4,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 994109006 + 202515) % 2147483647) AS mh5,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 40503 + 243018) % 2147483647) AS mh6,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 18652614 + 283521) % 2147483647) AS mh7
      FROM toks GROUP BY doc_id),
    sig AS (
      SELECT sig0.*, d.lang, (d.n_chars // 100) AS len_bucket
      FROM sig0 JOIN documents d USING (doc_id)),
    bands AS (
      SELECT doc_id, lang, len_bucket, 0 AS band, concat_ws('_', mh0::VARCHAR, mh1::VARCHAR) AS bkey FROM sig
      UNION ALL
      SELECT doc_id, lang, len_bucket, 1 AS band, concat_ws('_', mh2::VARCHAR, mh3::VARCHAR) AS bkey FROM sig
      UNION ALL
      SELECT doc_id, lang, len_bucket, 2 AS band, concat_ws('_', mh4::VARCHAR, mh5::VARCHAR) AS bkey FROM sig
      UNION ALL
      SELECT doc_id, lang, len_bucket, 3 AS band, concat_ws('_', mh6::VARCHAR, mh7::VARCHAR) AS bkey FROM sig
    ),
    pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id),
    sp AS (
      SELECT doc_id,
             CASE WHEN (('0x' || substr(md5(doc_id::VARCHAR || '_7'), 1, 15))::BIGINT)
                       < 922337203685477632 THEN 'train'
                  WHEN (('0x' || substr(md5(doc_id::VARCHAR || '_7'), 1, 15))::BIGINT)
                       < 1037629354146162304 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    lab AS (
      SELECT least(sa.split, sb.split) AS split_a,
             greatest(sa.split, sb.split) AS split_b
      FROM pairs
      JOIN sp sa ON sa.doc_id = pairs.doc_a
      JOIN sp sb ON sb.doc_id = pairs.doc_b)
    SELECT split_a, split_b, COUNT(*)::BIGINT AS n_pairs,
           (split_a <> split_b) AS leaks
    FROM lab GROUP BY split_a, split_b
    ORDER BY split_a, split_b
