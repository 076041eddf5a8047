WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
      FROM embeddings),
    n AS (SELECT vec_id, ev, sqrt(list_dot_product(ev, ev)) AS nrm FROM e),
    s AS (SELECT vec_id AS seed_id, ev AS sv, nrm AS snrm FROM n
          WHERE vec_id < 16),
    xr AS (
      SELECT n.vec_id, s.seed_id,
             ROW_NUMBER() OVER (
               PARTITION BY n.vec_id
               ORDER BY list_dot_product(n.ev, s.sv) / (n.nrm * s.snrm) DESC,
                        s.seed_id) AS rn
      FROM n, s),
    cells AS (SELECT vec_id, seed_id AS cell FROM xr WHERE rn = 1),
    a AS MATERIALIZED (SELECT c.vec_id, c.cell, n.ev, n.nrm
          FROM cells c JOIN n USING (vec_id)),
    samp AS MATERIALIZED (
      SELECT cell, vec_id,
             list_transform(ev, x -> x / GREATEST(nrm, 1e-12)) AS xv
      FROM (SELECT cell, vec_id, ev, nrm,
                   ROW_NUMBER() OVER (PARTITION BY cell
                     ORDER BY md5(vec_id::VARCHAR), vec_id) AS smp_r
            FROM a)
      WHERE smp_r <= 512),
    sd AS MATERIALIZED (SELECT cell, vec_id,
                  unnest(range(len(xv))) AS i, unnest(xv) AS v
           FROM samp),
    c0 AS MATERIALIZED (
      SELECT cell, id_rk AS srk, xv AS cv FROM (
        SELECT cell, vec_id, xv,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY vec_id) AS id_rk
        FROM samp)
      WHERE id_rk <= 3),
    asg0 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c0 c USING (cell))
      WHERE rn = 1),
    sm0 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg0 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv0 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm0 GROUP BY cell, srk),
    c1 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c0 c LEFT JOIN vv0 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg1 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c1 c USING (cell))
      WHERE rn = 1),
    sm1 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg1 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv1 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm1 GROUP BY cell, srk),
    c2 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c1 c LEFT JOIN vv1 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg2 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c2 c USING (cell))
      WHERE rn = 1),
    sm2 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg2 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv2 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm2 GROUP BY cell, srk),
    c3 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c2 c LEFT JOIN vv2 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg3 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c3 c USING (cell))
      WHERE rn = 1),
    sm3 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg3 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv3 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm3 GROUP BY cell, srk),
    c4 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c3 c LEFT JOIN vv3 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg4 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c4 c USING (cell))
      WHERE rn = 1),
    sm4 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg4 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv4 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm4 GROUP BY cell, srk),
    c5 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c4 c LEFT JOIN vv4 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg5 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c5 c USING (cell))
      WHERE rn = 1),
    sm5 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg5 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv5 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm5 GROUP BY cell, srk),
    c6 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c5 c LEFT JOIN vv5 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg6 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c6 c USING (cell))
      WHERE rn = 1),
    sm6 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg6 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv6 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm6 GROUP BY cell, srk),
    c7 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c6 c LEFT JOIN vv6 v
        ON c.cell = v.cell AND c.srk = v.srk),
    asg7 AS MATERIALIZED (
      SELECT cell, vec_id, srk FROM (
        SELECT s.cell, s.vec_id, c.srk,
               ROW_NUMBER() OVER (PARTITION BY s.cell, s.vec_id
                 ORDER BY list_dot_product(s.xv, c.cv) DESC, c.srk) AS rn
        FROM samp s JOIN c7 c USING (cell))
      WHERE rn = 1),
    sm7 AS MATERIALIZED (
      SELECT g.cell, g.srk, d.i, SUM(d.v) AS sv
      FROM asg7 g JOIN sd d
        ON g.cell = d.cell AND g.vec_id = d.vec_id
      GROUP BY g.cell, g.srk, d.i),
    vv7 AS MATERIALIZED (
      SELECT cell, srk, list(sv ORDER BY i) AS vec,
             sqrt(SUM(sv * sv)) AS nn
      FROM sm7 GROUP BY cell, srk),
    c8 AS MATERIALIZED (
      SELECT c.cell, c.srk,
             CASE WHEN v.nn > 1e-12
                  THEN list_transform(v.vec, x -> x / v.nn)
                  ELSE c.cv END AS cv
      FROM c7 c LEFT JOIN vv7 v
        ON c.cell = v.cell AND c.srk = v.srk),
    s2 AS MATERIALIZED (SELECT cell, srk, cv AS sv,
                  GREATEST(sqrt(list_dot_product(cv, cv)), 1e-12) AS snrm
           FROM c8),
    sxr AS (
      SELECT a.vec_id, s2.srk,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.ev, s2.sv)
                        / (a.nrm * s2.snrm) DESC,
                        s2.srk) AS rn
      FROM a JOIN s2 USING (cell)),
    b AS MATERIALIZED (
      SELECT a.vec_id, a.cell, sxr.srk::BIGINT AS subcell, a.ev, a.nrm
      FROM a JOIN sxr ON a.vec_id = sxr.vec_id AND sxr.rn = 1),
    drops AS (
      SELECT DISTINCT y.vec_id
      FROM b AS x JOIN b AS y
        ON x.cell = y.cell AND x.subcell = y.subcell
       AND x.vec_id < y.vec_id
      WHERE list_dot_product(x.ev, y.ev) / (x.nrm * y.nrm) >= 0.4)
    SELECT b.vec_id, b.cell, b.subcell, (d.vec_id IS NULL) AS keep
    FROM b LEFT JOIN drops d ON b.vec_id = d.vec_id
    ORDER BY b.vec_id
