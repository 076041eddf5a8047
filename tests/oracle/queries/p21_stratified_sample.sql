SELECT lang, COUNT(*)::BIGINT AS n_kept FROM documents
    WHERE (('0x' || substr(md5(concat(doc_id::VARCHAR, '_7')), 1, 15))::BIGINT)
          < CASE lang WHEN 'en' THEN CAST(0.5  * 1152921504606846976 AS BIGINT)
                      WHEN 'de' THEN CAST(0.25 * 1152921504606846976 AS BIGINT)
                      WHEN 'fr' THEN CAST(0.1  * 1152921504606846976 AS BIGINT)
                      END
    GROUP BY lang ORDER BY lang
