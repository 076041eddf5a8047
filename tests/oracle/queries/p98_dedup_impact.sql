WITH RECURSIVE toks AS (
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
    edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION
      SELECT doc_b AS x, doc_a AS y FROM pairs),
    reach AS (
      SELECT x AS node, x AS r FROM (SELECT DISTINCT x FROM edges) t
      UNION
      SELECT e.x AS node, reach.r
      FROM edges e JOIN reach ON reach.node = e.y),
    comp AS (
      SELECT node AS doc_id, MIN(r) AS rep FROM reach GROUP BY node),
    q AS (
      SELECT doc_id,
             ROUND(least(len(string_split_regex(trim(text), '\s+')) / 100.0, 1.0) * 0.4
                   + (1.0 - least((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                                  / greatest(length(text), 1.0) * 10.0, 1.0)) * 0.3
                   + least(len(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> list_contains(['the','a','of','to','and','in','is','it','that','for'], x)))
                           / greatest(len(string_split_regex(trim(text), '\s+')), 1.0) * 5.0, 1.0) * 0.3,
                   6) AS quality
      FROM documents),
    ranked AS (
      SELECT comp.doc_id, comp.rep, q.quality,
             ROW_NUMBER() OVER (
               PARTITION BY comp.rep
               ORDER BY q.quality DESC, comp.doc_id) AS rn
      FROM comp JOIN q ON q.doc_id = comp.doc_id),
    drops AS (SELECT doc_id FROM ranked WHERE rn > 1)
    SELECT COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped,
           SUM(n_chars)::BIGINT AS chars_total,
           SUM(CASE WHEN d.doc_id IS NOT NULL THEN n_chars ELSE 0 END)::BIGINT
             AS chars_dropped,
           ROUND(AVG(CASE WHEN d.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
             AS drop_rate
    FROM documents LEFT JOIN drops d USING (doc_id)
