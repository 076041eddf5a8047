WITH inj AS (
      SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR ||
             '@example.com call 555-123-4567 ssn 123-45-6789 from 10.0.0.15'
             AS text
      FROM documents),
    pats AS (
      SELECT doc_id, text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS p_email,
             '\b\d{3}-\d{2}-\d{4}\b' AS p_ssn,
             '(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b' AS p_phone,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b' AS p_ip
      FROM inj)
    SELECT doc_id,
           len(regexp_extract_all(text, p_email))::BIGINT AS n_email,
           len(regexp_extract_all(text, p_ssn))::BIGINT AS n_ssn,
           len(regexp_extract_all(text, p_phone))::BIGINT AS n_phone,
           len(regexp_extract_all(text, p_ip))::BIGINT AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text, p_email, '<EMAIL>', 'g'), p_ssn, '<SSN>', 'g'),
               p_phone, '<PHONE>', 'g'), p_ip, '<IP>', 'g')) AS scrub_hash
    FROM pats ORDER BY doc_id
