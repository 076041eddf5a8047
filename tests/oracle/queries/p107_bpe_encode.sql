WITH words AS (
      SELECT w, COUNT(*)::BIGINT AS cnt FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[A-Za-z0-9]+$') GROUP BY w),
    seq0 AS (
      SELECT w, cnt,
             string_split(trim(regexp_replace(w, '(.)', '\1 ', 'g')), ' ')
             AS syms
      FROM words),
    pair1 AS (
      SELECT p[1] AS s1, p[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS p
            FROM seq0) u
      WHERE p[2] IS NOT NULL
      GROUP BY 1, 2 ORDER BY n DESC, s1, s2 LIMIT 1),
    seq1 AS (
      SELECT w, cnt, string_split((CASE WHEN strpos(f1,'|')=0 THEN f1 WHEN split_part(f1,'|',2)='' THEN split_part(f1,'|',1) WHEN split_part(f1,'|',1)='' THEN split_part(f1,'|',2) ELSE split_part(f1,'|',1)||' '||split_part(f1,'|',2) END), ' ')
             AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) = pair1.s1 AND x = pair1.s2 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN pair1.s1 || pair1.s2
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || pair1.s1 || pair1.s2 END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f1
            FROM seq0, pair1) ff),
    pair2 AS (
      SELECT p[1] AS s1, p[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS p
            FROM seq1) u
      WHERE p[2] IS NOT NULL
      GROUP BY 1, 2 ORDER BY n DESC, s1, s2 LIMIT 1),
    seq2 AS (
      SELECT w, cnt, string_split((CASE WHEN strpos(f2,'|')=0 THEN f2 WHEN split_part(f2,'|',2)='' THEN split_part(f2,'|',1) WHEN split_part(f2,'|',1)='' THEN split_part(f2,'|',2) ELSE split_part(f2,'|',1)||' '||split_part(f2,'|',2) END), ' ')
             AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) = pair2.s1 AND x = pair2.s2 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN pair2.s1 || pair2.s2
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || pair2.s1 || pair2.s2 END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f2
            FROM seq1, pair2) ff),
    pair3 AS (
      SELECT p[1] AS s1, p[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS p
            FROM seq2) u
      WHERE p[2] IS NOT NULL
      GROUP BY 1, 2 ORDER BY n DESC, s1, s2 LIMIT 1),
    seq3 AS (
      SELECT w, cnt, string_split((CASE WHEN strpos(f3,'|')=0 THEN f3 WHEN split_part(f3,'|',2)='' THEN split_part(f3,'|',1) WHEN split_part(f3,'|',1)='' THEN split_part(f3,'|',2) ELSE split_part(f3,'|',1)||' '||split_part(f3,'|',2) END), ' ')
             AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) = pair3.s1 AND x = pair3.s2 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN pair3.s1 || pair3.s2
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || pair3.s1 || pair3.s2 END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f3
            FROM seq2, pair3) ff),
    pair4 AS (
      SELECT p[1] AS s1, p[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS p
            FROM seq3) u
      WHERE p[2] IS NOT NULL
      GROUP BY 1, 2 ORDER BY n DESC, s1, s2 LIMIT 1),
    seq4 AS (
      SELECT w, cnt, string_split((CASE WHEN strpos(f4,'|')=0 THEN f4 WHEN split_part(f4,'|',2)='' THEN split_part(f4,'|',1) WHEN split_part(f4,'|',1)='' THEN split_part(f4,'|',2) ELSE split_part(f4,'|',1)||' '||split_part(f4,'|',2) END), ' ')
             AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) = pair4.s1 AND x = pair4.s2 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN pair4.s1 || pair4.s2
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || pair4.s1 || pair4.s2 END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f4
            FROM seq3, pair4) ff),
    enc AS (
      SELECT w, len(syms)::BIGINT AS n_sub FROM seq4),
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[A-Za-z0-9]+$'))
    SELECT doc_id, COUNT(*)::BIGINT AS n_words,
           SUM(n_sub)::BIGINT AS n_subwords,
           SUM(length(w))::BIGINT AS n_chars,
           ROUND(SUM(length(w))::DOUBLE / SUM(n_sub), 6)
             AS chars_per_subword
    FROM docw JOIN enc USING (w)
    GROUP BY doc_id ORDER BY doc_id
