SELECT doc_id, lang FROM documents
    WHERE (('0x' || substr(md5(concat(doc_id::VARCHAR, '_7')), 1, 15))::BIGINT)
          < CAST(0.25 * 1152921504606846976 AS BIGINT)
    ORDER BY doc_id
