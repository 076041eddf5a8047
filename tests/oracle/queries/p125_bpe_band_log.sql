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
    cm0 AS MATERIALIZED (SELECT 0 AS rnd, 0::BIGINT AS step, '' AS s1, '' AS s2, 0::BIGINT AS n, 0::BIGINT AS c_max, '' AS m FROM (VALUES (1)) _t(_x) WHERE FALSE),
    p1 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq0) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud1 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm0))::BIGINT AS b),
    rk1 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p1
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud1), 8)),
    cth1 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk1 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud1)
              OR r.m IN (SELECT m FROM cm0)) AS stop_inc
      FROM rk1 r),
    cut1 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth1),
    com1 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk1 r, cut1 c, bud1 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk1 WHERE rn = 1)::DOUBLE),
    cm1 AS MATERIALIZED (
      SELECT * FROM cm0
      UNION ALL
      SELECT 1 AS rnd,
             (SELECT COUNT(*) FROM cm0) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk1 WHERE rn = 1) AS c_max, m
      FROM com1),
    pl1 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com1),
    seq1 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f1,'|')=0 THEN f1 WHEN split_part(f1,'|',2)='' THEN split_part(f1,'|',1) WHEN split_part(f1,'|',1)='' THEN split_part(f1,'|',2) ELSE split_part(f1,'|',1)||' '||split_part(f1,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl1.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f1
            FROM seq0, pl1) ff),
    p2 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq1) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud2 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm1))::BIGINT AS b),
    rk2 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p2
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud2), 8)),
    cth2 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk2 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud2)
              OR r.m IN (SELECT m FROM cm1)) AS stop_inc
      FROM rk2 r),
    cut2 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth2),
    com2 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk2 r, cut2 c, bud2 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk2 WHERE rn = 1)::DOUBLE),
    cm2 AS MATERIALIZED (
      SELECT * FROM cm1
      UNION ALL
      SELECT 2 AS rnd,
             (SELECT COUNT(*) FROM cm1) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk2 WHERE rn = 1) AS c_max, m
      FROM com2),
    pl2 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com2),
    seq2 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f2,'|')=0 THEN f2 WHEN split_part(f2,'|',2)='' THEN split_part(f2,'|',1) WHEN split_part(f2,'|',1)='' THEN split_part(f2,'|',2) ELSE split_part(f2,'|',1)||' '||split_part(f2,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl2.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f2
            FROM seq1, pl2) ff),
    p3 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq2) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud3 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm2))::BIGINT AS b),
    rk3 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p3
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud3), 8)),
    cth3 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk3 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud3)
              OR r.m IN (SELECT m FROM cm2)) AS stop_inc
      FROM rk3 r),
    cut3 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth3),
    com3 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk3 r, cut3 c, bud3 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk3 WHERE rn = 1)::DOUBLE),
    cm3 AS MATERIALIZED (
      SELECT * FROM cm2
      UNION ALL
      SELECT 3 AS rnd,
             (SELECT COUNT(*) FROM cm2) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk3 WHERE rn = 1) AS c_max, m
      FROM com3),
    pl3 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com3),
    seq3 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f3,'|')=0 THEN f3 WHEN split_part(f3,'|',2)='' THEN split_part(f3,'|',1) WHEN split_part(f3,'|',1)='' THEN split_part(f3,'|',2) ELSE split_part(f3,'|',1)||' '||split_part(f3,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl3.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f3
            FROM seq2, pl3) ff),
    p4 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq3) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud4 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm3))::BIGINT AS b),
    rk4 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p4
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud4), 8)),
    cth4 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk4 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud4)
              OR r.m IN (SELECT m FROM cm3)) AS stop_inc
      FROM rk4 r),
    cut4 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth4),
    com4 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk4 r, cut4 c, bud4 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk4 WHERE rn = 1)::DOUBLE),
    cm4 AS MATERIALIZED (
      SELECT * FROM cm3
      UNION ALL
      SELECT 4 AS rnd,
             (SELECT COUNT(*) FROM cm3) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk4 WHERE rn = 1) AS c_max, m
      FROM com4),
    pl4 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com4),
    seq4 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f4,'|')=0 THEN f4 WHEN split_part(f4,'|',2)='' THEN split_part(f4,'|',1) WHEN split_part(f4,'|',1)='' THEN split_part(f4,'|',2) ELSE split_part(f4,'|',1)||' '||split_part(f4,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl4.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f4
            FROM seq3, pl4) ff),
    p5 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq4) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud5 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm4))::BIGINT AS b),
    rk5 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p5
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud5), 8)),
    cth5 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk5 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud5)
              OR r.m IN (SELECT m FROM cm4)) AS stop_inc
      FROM rk5 r),
    cut5 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth5),
    com5 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk5 r, cut5 c, bud5 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk5 WHERE rn = 1)::DOUBLE),
    cm5 AS MATERIALIZED (
      SELECT * FROM cm4
      UNION ALL
      SELECT 5 AS rnd,
             (SELECT COUNT(*) FROM cm4) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk5 WHERE rn = 1) AS c_max, m
      FROM com5),
    pl5 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com5),
    seq5 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f5,'|')=0 THEN f5 WHEN split_part(f5,'|',2)='' THEN split_part(f5,'|',1) WHEN split_part(f5,'|',1)='' THEN split_part(f5,'|',2) ELSE split_part(f5,'|',1)||' '||split_part(f5,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl5.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f5
            FROM seq4, pl5) ff),
    p6 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq5) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud6 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm5))::BIGINT AS b),
    rk6 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p6
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud6), 8)),
    cth6 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk6 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud6)
              OR r.m IN (SELECT m FROM cm5)) AS stop_inc
      FROM rk6 r),
    cut6 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth6),
    com6 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk6 r, cut6 c, bud6 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk6 WHERE rn = 1)::DOUBLE),
    cm6 AS MATERIALIZED (
      SELECT * FROM cm5
      UNION ALL
      SELECT 6 AS rnd,
             (SELECT COUNT(*) FROM cm5) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk6 WHERE rn = 1) AS c_max, m
      FROM com6),
    pl6 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com6),
    seq6 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f6,'|')=0 THEN f6 WHEN split_part(f6,'|',2)='' THEN split_part(f6,'|',1) WHEN split_part(f6,'|',1)='' THEN split_part(f6,'|',2) ELSE split_part(f6,'|',1)||' '||split_part(f6,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl6.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f6
            FROM seq5, pl6) ff),
    p7 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq6) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud7 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm6))::BIGINT AS b),
    rk7 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p7
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud7), 8)),
    cth7 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk7 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud7)
              OR r.m IN (SELECT m FROM cm6)) AS stop_inc
      FROM rk7 r),
    cut7 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth7),
    com7 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk7 r, cut7 c, bud7 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk7 WHERE rn = 1)::DOUBLE),
    cm7 AS MATERIALIZED (
      SELECT * FROM cm6
      UNION ALL
      SELECT 7 AS rnd,
             (SELECT COUNT(*) FROM cm6) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk7 WHERE rn = 1) AS c_max, m
      FROM com7),
    pl7 AS MATERIALIZED (
      SELECT COALESCE(string_agg(s1 || '|' || s2, ' ' ORDER BY rn), '')
             AS s FROM com7),
    seq7 AS MATERIALIZED (
      SELECT w, cnt,
             string_split((CASE WHEN strpos(f7,'|')=0 THEN f7 WHEN split_part(f7,'|',2)='' THEN split_part(f7,'|',1) WHEN split_part(f7,'|',1)='' THEN split_part(f7,'|',2) ELSE split_part(f7,'|',1)||' '||split_part(f7,'|',2) END), ' ') AS syms
      FROM (SELECT w, cnt, list_reduce(syms, (acc, x) ->
      CASE
        WHEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) LIKE '%|' THEN (CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END) || x
        WHEN strpos(' ' || pl7.s || ' ', ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || '|' || x || ' ') > 0 THEN
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || (split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) || x) END) || '|'
        ELSE
          (CASE WHEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) = '' THEN split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2)
                ELSE split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',1) || ' ' || split_part(CASE WHEN strpos(acc,'|')=0 THEN '|'||acc ELSE acc END,'|',2) END) || '|' || x
      END) AS f7
            FROM seq6, pl7) ff),
    p8 AS MATERIALIZED (
      SELECT pr[1] AS s1, pr[2] AS s2, SUM(cnt)::BIGINT AS n
      FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS pr
            FROM seq7) u
      WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
    bud8 AS MATERIALIZED (
      SELECT LEAST(64, 8 -
                   (SELECT COUNT(*) FROM cm7))::BIGINT AS b),
    rk8 AS MATERIALIZED (
      SELECT s1, s2, n, s1 || s2 AS m,
             ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2) AS rn
      FROM p8
      QUALIFY rn <= GREATEST(2 * (SELECT b FROM bud8), 8)),
    cth8 AS MATERIALIZED (
      SELECT r.rn,
             EXISTS (SELECT 1 FROM rk8 e WHERE e.rn < r.rn AND
                     (e.s1 IN (r.s1, r.s2, r.m)
                      OR e.s2 IN (r.s1, r.s2, r.m)
                      OR e.m IN (r.s1, r.s2, r.m))) AS conflict,
             (r.rn >= (SELECT b FROM bud8)
              OR r.m IN (SELECT m FROM cm7)) AS stop_inc
      FROM rk8 r),
    cut8 AS MATERIALIZED (
      SELECT COALESCE(MIN(CASE WHEN conflict THEN rn END), 1000000)
               AS excl,
             COALESCE(MIN(CASE WHEN stop_inc THEN rn END), 1000000)
               AS incl
      FROM cth8),
    com8 AS MATERIALIZED (
      SELECT r.rn, r.s1, r.s2, r.n, r.m
      FROM rk8 r, cut8 c, bud8 b
      WHERE b.b > 0 AND r.rn < c.excl AND r.rn <= c.incl
        AND r.n::DOUBLE >= (1.0 - 0.1) *
            (SELECT n FROM rk8 WHERE rn = 1)::DOUBLE),
    cm8 AS MATERIALIZED (
      SELECT * FROM cm7
      UNION ALL
      SELECT 8 AS rnd,
             (SELECT COUNT(*) FROM cm7) + rn AS step,
             s1, s2, n,
             (SELECT n FROM rk8 WHERE rn = 1) AS c_max, m
      FROM com8)
    SELECT step::INT AS step, rnd::INT AS "round",
           c_max::BIGINT AS c_max, s1 AS lhs, s2 AS rhs,
           n::BIGINT AS pair_count
    FROM cm8 ORDER BY step
