SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[.,!?;:''"()\[\]{}]', '', 'g'), '\s+', ' ', 'g')) AS text_norm,
           md5(trim(regexp_replace(regexp_replace(lower(text),
                '[.,!?;:''"()\[\]{}]', '', 'g'), '\s+', ' ', 'g'))) AS norm_hash
    FROM documents ORDER BY doc_id
