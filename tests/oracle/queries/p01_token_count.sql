SELECT doc_id,
           len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars_calc,
           ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0)::BIGINT AS n_subword_est
    FROM documents ORDER BY doc_id
