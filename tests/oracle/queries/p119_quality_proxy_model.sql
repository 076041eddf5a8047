WITH w AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
      FROM documents),
    tk AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(tok), 1, 15))::BIGINT) % 64 AS bkt
      FROM w, unnest(toks) AS t(tok)),
    cnt AS (
      SELECT bkt,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::DOUBLE AS ct,
             SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)::DOUBLE AS cr
      FROM tk GROUP BY bkt),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
    lam AS (
      SELECT bkt,
             floor(round(ln(((ct + 0.5) / (tt + 0.5 * 64))
                            / ((cr + 0.5) / (tr + 0.5 * 64))), 6)
                   * 1e6 + 0.5)::BIGINT AS lm
      FROM cnt, tot),
    sc AS (
      SELECT tk.doc_id, SUM(lm) AS sm
      FROM tk JOIN lam USING (bkt)
      GROUP BY tk.doc_id),
    ft AS (
      SELECT w.doc_id, w.source,
             len(toks)::DOUBLE AS f1,
             len(list_filter(toks, x -> list_contains(
               ['the','a','of','to','and','in','is','it','that','for'], x)
             ))::DOUBLE / len(toks)::DOUBLE AS f2,
             list_sum(list_transform(toks, x -> len(x)))::DOUBLE
               / len(toks)::DOUBLE AS f3,
             ROUND(sm / 1e6, 6) AS y
      FROM w JOIN sc ON w.doc_id = sc.doc_id),
    st AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(f1) AS m1, AVG(f2) AS m2, AVG(f3) AS m3, AVG(y) AS my,
             SUM(f1*f1) AS s11, SUM(f1*f2) AS s12, SUM(f1*f3) AS s13,
             SUM(f2*f2) AS s22, SUM(f2*f3) AS s23, SUM(f3*f3) AS s33,
             SUM(f1*y) AS c1s, SUM(f2*y) AS c2s, SUM(f3*y) AS c3s
      FROM ft),
    ge AS (
      SELECT n, m1, m2, m3, my,
             s11 - n*m1*m1 AS a11, s12 - n*m1*m2 AS a12,
             s13 - n*m1*m3 AS a13, s22 - n*m2*m2 AS a22,
             s23 - n*m2*m3 AS a23, s33 - n*m3*m3 AS a33,
             c1s - n*m1*my AS c1, c2s - n*m2*my AS c2, c3s - n*m3*my AS c3
      FROM st),
    de AS (
      SELECT *, a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
                + a13*(a12*a23 - a22*a13) AS det FROM ge),
    bs AS (
      SELECT my, m1, m2, m3,
        (c1*(a22*a33 - a23*a23) - a12*(c2*a33 - a23*c3)
         + a13*(c2*a23 - a22*c3)) / det AS b1,
        (a11*(c2*a33 - a23*c3) - c1*(a12*a33 - a23*a13)
         + a13*(a12*c3 - c2*a13)) / det AS b2,
        (a11*(a22*c3 - c2*a23) - a12*(a12*c3 - c2*a13)
         + c1*(a12*a23 - a22*a13)) / det AS b3
      FROM de),
    bb AS (SELECT my - m1*b1 - m2*b2 - m3*b3 AS b0, b1, b2, b3 FROM bs)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(bb.b0 + bb.b1*f1 + bb.b2*f2 + bb.b3*f3), 6) AS avg_pred,
           SUM(CASE WHEN bb.b0 + bb.b1*f1 + bb.b2*f2 + bb.b3*f3 > 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_pass,
           ROUND(AVG(ABS(y - (bb.b0 + bb.b1*f1 + bb.b2*f2 + bb.b3*f3))), 6)
             AS mae
    FROM ft, bb
    GROUP BY source ORDER BY source
