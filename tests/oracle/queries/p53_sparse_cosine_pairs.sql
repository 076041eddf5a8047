WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*)::DOUBLE AS tf
           FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
    kept AS (SELECT tok, df FROM dfreq, nd WHERE df <= 0.5 * n),
    cells AS (
      SELECT doc_id, tf.tok, tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS w
      FROM tf JOIN kept ON tf.tok = kept.tok, nd),
    norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm
              FROM cells GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
      FROM cells a JOIN cells b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(dot / (na.nrm * nb.nrm), 6) AS cos
    FROM dots JOIN norms na ON dots.doc_a = na.doc_id
              JOIN norms nb ON dots.doc_b = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.5
    ORDER BY doc_a, doc_b
