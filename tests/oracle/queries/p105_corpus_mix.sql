WITH toks AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tok
      FROM documents WHERE source IN ('src0', 'src1', 'src2')),
    wt AS (SELECT * FROM (VALUES ('src0', 50), ('src1', 30), ('src2', 20))
           AS v(source, w)),
    mass AS (
      SELECT toks.source, wt.w::BIGINT AS w, SUM(n_tok)::BIGINT AS mass,
             COUNT(*)::BIGINT AS n_docs
      FROM toks JOIN wt ON toks.source = wt.source
      GROUP BY toks.source, wt.w),
    tt AS (SELECT MIN((100 * mass) // w)::BIGINT AS t FROM mass),
    rated AS (
      SELECT source, w, mass, n_docs,
             ((w * t) // 100)::BIGINT AS target_tokens
      FROM mass, tt),
    rr AS (
      SELECT *,
             LEAST(1000000,
                   ((1000 * target_tokens) // mass) * 1000
                   + (1000 * ((1000 * target_tokens) % mass)) // mass
                   )::BIGINT AS rate_ppm
      FROM rated),
    keep AS (
      SELECT toks.source, COUNT(*)::BIGINT AS kept_docs,
             SUM(n_tok)::BIGINT AS kept_tokens
      FROM toks JOIN rr ON toks.source = rr.source
      WHERE (('0x' || substr(md5(doc_id::VARCHAR || '_mix'), 1, 15))::BIGINT)
            % 1000000 < rate_ppm
      GROUP BY toks.source)
    SELECT rr.source, w, mass, n_docs, rate_ppm, target_tokens,
           COALESCE(kept_docs, 0)::BIGINT AS kept_docs,
           COALESCE(kept_tokens, 0)::BIGINT AS kept_tokens
    FROM rr LEFT JOIN keep ON rr.source = keep.source
    ORDER BY rr.source
