SELECT * FROM (
(WITH ym AS (SELECT 1 AS one),
g AS (SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_linenumber - 1) UNION ALL SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_orderkey % 400) UNION ALL SELECT ABS((COUNT(*) - SUM(l_quantity)) / SQRT(COUNT(*)::DOUBLE)) AS gv FROM lineitem GROUP BY (l_partkey % 400)),
r AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
             SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
      FROM g)
SELECT -1 AS path_idx,
       (SELECT ROUND(MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)), 6) + 0.0 FROM r) AS sigma,
       0.0 AS dev_ratio, 0 AS n_nonzero, TRUE AS kkt_ok)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.889172 AS dev_ratio, 0 AS n_nonzero, (WITH src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               3.23381041331653529e+00 AS lp0
        FROM src s),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) <= 0.5 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.889661 AS dev_ratio, 25 AS n_nonzero, (WITH bw AS (SELECT * FROM (VALUES (7, 7.46141788691997987e-02), (27, 4.63042376375530709e-02), (61, 9.82096076474353319e-02), (148, 9.00692424529297118e-03), (184, -5.59550382774018796e-03), (208, -4.91415084235320293e-02), (220, -5.81440148537268747e-02), (249, 9.42340045539880877e-02), (253, 1.92129630580570587e-01), (285, -6.17853635807066176e-02), (287, -1.98570398159673353e-02), (296, -2.06703414546271494e-03), (305, -8.20922397261569098e-02), (339, 3.09311708180746402e-02), (360, 5.43870872716814991e-03), (369, 7.33610105077043412e-02), (430, 3.15145856845128053e-02), (438, 7.81399823699862051e-02), (452, -1.06252403331410117e-01), (460, 7.93728762500986234e-04), (495, 4.50968885969504421e-02), (537, 2.18376063299508365e-02), (576, -2.31987884655891138e-02), (594, -3.49986938337515999e-02), (602, -5.45301589561744196e-02)) AS bw(j, v0)),
src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               (3.23342786270208649e+00 + COALESCE(w0.v0, 0.0) + COALESCE(w1.v0, 0.0) + COALESCE(w2.v0, 0.0)) AS lp0
        FROM src s LEFT JOIN bw w0 ON w0.j = s.j0 LEFT JOIN bw w1 ON w1.j = s.j1 LEFT JOIN bw w2 ON w2.j = s.j2),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) BETWEEN 0.2 * (1.0 - 0.0002) AND 0.2 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 6000)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.890562 AS dev_ratio, 0 AS n_nonzero, (WITH src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               3.23483775277844243e+00 AS lp0
        FROM src s),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) <= 0.5 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.890586 AS dev_ratio, 14 AS n_nonzero, (WITH bw AS (SELECT * FROM (VALUES (5, 9.48297725804007571e-04), (152, -2.31353162368283100e-02), (165, -8.30984393816390499e-03), (240, -1.63129752107767870e-03), (262, -6.26443592695118210e-03), (484, 3.06445300083808998e-02), (541, 9.21676899759830796e-03), (555, -9.25698451303948937e-04), (558, 5.96557730870785341e-02), (578, -1.90393768510254344e-02), (590, 1.77106867262942780e-02), (610, 8.49398173205955995e-03), (701, -7.31422486636182541e-03), (751, -2.22240351733601644e-03)) AS bw(j, v0)),
src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               (3.23455392930697538e+00 + COALESCE(w0.v0, 0.0) + COALESCE(w1.v0, 0.0) + COALESCE(w2.v0, 0.0)) AS lp0
        FROM src s LEFT JOIN bw w0 ON w0.j = s.j0 LEFT JOIN bw w1 ON w1.j = s.j1 LEFT JOIN bw w2 ON w2.j = s.j2),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) BETWEEN 0.2 * (1.0 - 0.0002) AND 0.2 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 60000)
UNION ALL
(SELECT 0 AS path_idx, 0.5 AS sigma, 0.891117 AS dev_ratio, 0 AS n_nonzero, (WITH src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               3.23870662170225554e+00 AS lp0
        FROM src s),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) <= 0.5 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 600000)
UNION ALL
(SELECT 1 AS path_idx, 0.2 AS sigma, 0.891121 AS dev_ratio, 26 AS n_nonzero, (WITH bw AS (SELECT * FROM (VALUES (5, -3.27283575081136347e-04), (41, -4.32217318107451769e-03), (68, -2.25583268935966976e-03), (85, -7.89009695081094309e-03), (108, -2.68130646523115183e-03), (155, 9.17364698586074453e-04), (200, 6.07142816316755805e-04), (217, 5.89073704336201087e-04), (267, 7.65847884316910293e-03), (288, 9.08767938413989495e-05), (318, -4.68541211879476820e-03), (326, 9.41406795614615002e-03), (407, -9.25410035956482547e-05), (452, -8.45624945804157547e-04), (461, -6.26782810146596977e-03), (496, -1.01089224360686181e-02), (517, -1.51182736357868726e-02), (527, 3.98844552908650483e-03), (599, 1.30209462197406335e-03), (639, 7.80473842134091298e-03), (653, -6.00273092450718431e-04), (670, -8.06443125396481657e-03), (710, -4.25050212318835077e-03), (711, 1.06732414101895273e-03), (724, 1.91340108345701572e-04), (776, -5.71674185546416566e-03)) AS bw(j, v0)),
src AS (SELECT (l_linenumber - 1) AS j0, (7 + (l_orderkey % 400)) AS j1, (407 + (l_partkey % 400)) AS j2, l_quantity, l_returnflag FROM lineitem),
lpv AS (SELECT s.j0, s.j1, s.j2, s.l_quantity, s.l_returnflag,
               (3.23884860323740797e+00 + COALESCE(w0.v0, 0.0) + COALESCE(w1.v0, 0.0) + COALESCE(w2.v0, 0.0)) AS lp0
        FROM src s LEFT JOIN bw w0 ON w0.j = s.j0 LEFT JOIN bw w1 ON w1.j = s.j1 LEFT JOIN bw w2 ON w2.j = s.j2),
rr AS (SELECT j0, j1, j2, (EXP(lp0) - l_quantity) AS r0 FROM lpv),
g AS (SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j0 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j1 UNION ALL SELECT ABS(SUM(r0)) / SQRT(COUNT(*)::DOUBLE) AS gv FROM rr GROUP BY j2),
kr AS (SELECT ROW_NUMBER() OVER (ORDER BY gv DESC) AS rn,
              SUM(gv) OVER (ORDER BY gv DESC ROWS UNBOUNDED PRECEDING) AS cg
       FROM g)
SELECT (MAX(cg / (rn * (0.2 * 807.0 + 1.0) - 0.2 * rn * (rn + 1.0) / 2.0)) BETWEEN 0.2 * (1.0 - 0.0002) AND 0.2 * (1.0 + 0.0002)) AND ABS((SELECT SUM(r0) FROM rr)) / (SELECT COUNT(*) FROM rr) < 0.0001 FROM kr) AS kkt_ok FROM lineitem HAVING COUNT(*) = 600000)
) ORDER BY path_idx
