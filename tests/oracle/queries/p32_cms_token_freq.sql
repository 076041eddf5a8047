WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents),
    counts AS (
      SELECT tok, COUNT(*)::BIGINT AS true_count FROM toks GROUP BY tok),
    tok_cells AS (SELECT tok, ((('0x' || substr(md5(concat_ws(':', '0', tok)), 1, 15))::BIGINT) % 1024) AS c0, ((('0x' || substr(md5(concat_ws(':', '1', tok)), 1, 15))::BIGINT) % 1024) AS c1, ((('0x' || substr(md5(concat_ws(':', '2', tok)), 1, 15))::BIGINT) % 1024) AS c2 FROM toks),
    cells AS (SELECT 0 AS row, c0 AS cell, tok FROM tok_cells UNION ALL SELECT 1 AS row, c1 AS cell, tok FROM tok_cells UNION ALL SELECT 2 AS row, c2 AS cell, tok FROM tok_cells),
    sketch AS (
      SELECT row, cell, COUNT(*)::BIGINT AS cnt
      FROM cells GROUP BY row, cell),
    probes AS (
      SELECT tok, true_count FROM counts
      ORDER BY true_count DESC, tok LIMIT 20),
    probe_cells AS (
      SELECT p.tok, p.true_count, pc.row, pc.cell
      FROM probes p, LATERAL (
        SELECT 0 AS row, ((('0x' || substr(md5(concat_ws(':', '0', p.tok)), 1, 15))::BIGINT) % 1024) AS cell UNION ALL SELECT 1 AS row, ((('0x' || substr(md5(concat_ws(':', '1', p.tok)), 1, 15))::BIGINT) % 1024) AS cell UNION ALL SELECT 2 AS row, ((('0x' || substr(md5(concat_ws(':', '2', p.tok)), 1, 15))::BIGINT) % 1024) AS cell) pc),
    est AS (
      SELECT pc.tok, pc.true_count, MIN(s.cnt) AS cms_count
      FROM probe_cells pc JOIN sketch s ON s.row = pc.row AND s.cell = pc.cell
      GROUP BY pc.tok, pc.true_count)
    SELECT tok, true_count, cms_count,
           (cms_count - true_count) AS overcount
    FROM est ORDER BY true_count DESC, tok
