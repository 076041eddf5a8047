WITH q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> list_contains(['the','a','of','to','and','in','is','it','that','for'], x)))::DOUBLE AS n_stop
      FROM documents)
    SELECT doc_id,
           ROUND(punct / greatest(n_char, 1.0), 6) AS q_punct_ratio,
           ROUND(n_stop / greatest(n_tok, 1.0), 6) AS q_stop_ratio,
           ROUND((n_char - (n_tok - 1)) / n_tok, 6) AS q_mean_wordlen,
           ROUND(least(n_tok / 100.0, 1.0) * 0.4
                 + (1.0 - least(punct / greatest(n_char, 1.0) * 10.0, 1.0)) * 0.3
                 + least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.3, 6) AS quality
    FROM q ORDER BY doc_id
