WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok FROM documents)
    SELECT doc_id,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 506952114 + 0) % 2147483647) AS mh0,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 99338872 + 40503) % 2147483647) AS mh1,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 1119006270 + 81006) % 2147483647) AS mh2,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 668265263 + 121509) % 2147483647) AS mh3,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 374761393 + 162012) % 2147483647) AS mh4,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 994109006 + 202515) % 2147483647) AS mh5,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 40503 + 243018) % 2147483647) AS mh6,
           MIN((((('0x' || substr(md5(tok), 1, 15))::BIGINT) % 2147483647) * 18652614 + 283521) % 2147483647) AS mh7
    FROM toks GROUP BY doc_id ORDER BY doc_id
