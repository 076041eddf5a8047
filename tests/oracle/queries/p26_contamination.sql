WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS gram
      FROM tok),
    probe AS (
      SELECT doc_id AS probe_id, gram FROM g WHERE doc_id % 13 = 0),
    psize AS (
      SELECT probe_id, COUNT(*)::DOUBLE AS n_probe FROM probe GROUP BY probe_id),
    hits AS (
      SELECT g.doc_id, p.probe_id, COUNT(*)::DOUBLE AS n_hits
      FROM g JOIN probe p USING (gram)
      WHERE g.doc_id <> p.probe_id
      GROUP BY 1, 2)
    SELECT doc_id, probe_id, ROUND(n_hits / n_probe, 6) AS overlap
    FROM hits JOIN psize USING (probe_id)
    WHERE n_hits / n_probe >= 0.3
    ORDER BY doc_id, probe_id
