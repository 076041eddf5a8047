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
    a AS (SELECT c.vec_id, c.cell, n.ev, n.nrm
          FROM cells c JOIN n USING (vec_id)),
    s2 AS (
      SELECT cell, srk, ev AS sv, nrm AS snrm FROM (
        SELECT cell, ev, nrm,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY vec_id) AS srk
        FROM a) WHERE srk <= 3),
    sxr AS (
      SELECT a.vec_id, s2.srk,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_dot_product(a.ev, s2.sv)
                        / (a.nrm * s2.snrm) DESC,
                        s2.srk) AS rn
      FROM a JOIN s2 USING (cell)),
    b AS (
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
