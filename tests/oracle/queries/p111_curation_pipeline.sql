WITH dedup AS (
      SELECT * FROM (
        SELECT d.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents d) x
      WHERE doc_id = keep_id),
    q AS (
      SELECT doc_id, source, n_chars,
             len(string_split_regex(trim(text), '\s+'))::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '',
                                                   'g')))::DOUBLE AS punct,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> list_contains(['the','a','of','to','and','in','is',
                                     'it','that','for'], x)))::DOUBLE
               AS n_stop
      FROM dedup),
    scored AS (
      SELECT doc_id, source, n_chars,
             ROUND(least(n_tok / 100.0, 1.0) * 0.4
                   + (1.0 - least(punct / greatest(n_char, 1.0) * 10.0,
                                  1.0)) * 0.3
                   + least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.3,
                   6) AS quality
      FROM q),
    gated AS (SELECT * FROM scored WHERE quality >= 0.4),
    packed AS (
      SELECT *,
             (SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING)
              - n_chars) AS cum_before
      FROM gated)
    SELECT source, COUNT(*)::BIGINT AS n_kept,
           SUM(n_chars)::BIGINT AS chars_kept,
           (SUM(floor(quality * 1e6 + 0.5)::BIGINT)
            // COUNT(*))::BIGINT AS mean_quality_micro
    FROM packed WHERE cum_before < 3000
    GROUP BY source ORDER BY source
