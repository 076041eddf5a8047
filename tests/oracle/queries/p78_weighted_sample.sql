WITH keyed AS (
      SELECT doc_id,
             -ln(((('0x' || substr(md5(doc_id::VARCHAR || '_5'), 1, 15))::BIGINT)::DOUBLE
                  + 1.0) / 1.152921504606847e+18)
               / (n_chars + 1)::DOUBLE AS k
      FROM documents)
    SELECT doc_id FROM keyed ORDER BY k, doc_id LIMIT 25
