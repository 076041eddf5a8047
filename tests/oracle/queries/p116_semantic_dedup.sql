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
    drops AS (
      SELECT DISTINCT y.vec_id
      FROM a AS x JOIN a AS y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_dot_product(x.ev, y.ev) / (x.nrm * y.nrm) >= 0.4)
    SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
    FROM a LEFT JOIN drops d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id
