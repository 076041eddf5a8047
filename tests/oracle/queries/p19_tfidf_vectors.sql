WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, tok),
    dfreq AS (
      SELECT tok, COUNT(*)::DOUBLE AS df FROM tf GROUP BY tok),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
    vocab AS (
      SELECT tok, df, ROW_NUMBER() OVER (ORDER BY df DESC, tok) - 1 AS term_idx
      FROM dfreq WHERE df >= 2)
    SELECT t.doc_id, v.term_idx::BIGINT AS term_idx,
           ROUND(t.tf * (LN((n.n + 1.0) / (v.df + 1.0)) + 1.0), 6) AS weight
    FROM tf t JOIN vocab v USING (tok), n
    ORDER BY doc_id, term_idx
