WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev FROM embeddings),
    n AS (
      SELECT vec_id, ev, sqrt(list_dot_product(ev, ev)) AS nrm FROM e),
    s AS (
      SELECT vec_id AS seed_id, ev AS sv, nrm AS snrm FROM n WHERE vec_id < 16),
    x AS (
      SELECT n.vec_id, s.seed_id,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                ORDER BY list_dot_product(n.ev, s.sv) / (n.nrm * s.snrm) DESC,
                                         s.seed_id) AS rn
      FROM n, s),
    cells AS (
      SELECT x.vec_id, x.seed_id AS cell, n.ev, n.nrm
      FROM x JOIN n ON x.vec_id = n.vec_id WHERE x.rn = 1),
    qp AS (
      SELECT x.vec_id AS query_id, x.seed_id AS qcell, n.ev AS qv, n.nrm AS qnrm
      FROM x JOIN n ON x.vec_id = n.vec_id
      WHERE x.vec_id IN (0, 1, 2) AND x.rn <= 2),
    scored AS (
      SELECT q.query_id, c.vec_id,
             ROUND(list_dot_product(c.ev, q.qv) / (c.nrm * q.qnrm), 6) AS cos
      FROM cells c JOIN qp q ON c.cell = q.qcell AND c.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
    SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 5
    ORDER BY query_id, cos DESC, vec_id
