"""Declared oracle-checkable kernel queries (SURVEY.md §2b, K1-K20).

Each kernel is the data-side primitive underlying one of the reference
operators (O-numbers cite SURVEY §2a / /root/reference file:line). Both
engines run SQL: Spark executes ``spark_sql`` through Catalyst (predicate
pushdown + whole-stage codegen over the parquet scans), DuckDB executes
``duck_sql`` as the oracle. For most kernels the two texts are identical
ANSI SQL; they diverge only where engine semantics differ (hash functions,
integer division).

Determinism conventions:
- every float output is ROUND(x, k) with k chosen so cross-engine
  floating-point summation noise is far below the rounding granularity;
- every query has a total ORDER BY (primary keys break ties);
- no rand(); tie-breaks use keys (replaces the reference's sampling in
  trainOwl.R:92-94 and score.R:153).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Kernel:
    name: str
    spark_sql: str
    duck_sql: str
    doc: str


def _same(name: str, sql: str, doc: str) -> Kernel:
    return Kernel(name, sql, sql, doc)


_KERNELS: list[Kernel] = []


def _add(k: Kernel) -> None:
    _KERNELS.append(k)


# K1 — column moments (O6 standardize; reference src/standardize.h:17-28)
_add(_same(
    "k01_column_moments",
    """
    SELECT ROUND(AVG(l_quantity), 6) AS mean_qty,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(MIN(l_quantity), 6) AS min_qty,
           ROUND(MAX(l_quantity), 6) AS max_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    """,
    "column mean/std/min/max — the standardize() statistics pass",
))

# K2 — L1/L2 norms (O6 scale='l1'/'l2'; src/standardize.h:23-26). The raw
# sums are ~1e9 at sf0.1 so they are scaled by 1e6 before rounding to keep
# fp noise below granularity.
_add(_same(
    "k02_column_norms",
    """
    SELECT ROUND(SUM(ABS(l_extendedprice)) / 1000000, 6) AS l1_mm,
           ROUND(SQRT(SUM(l_extendedprice * l_extendedprice)) / 1000000, 6) AS l2_mm,
           ROUND(AVG(ABS(l_discount)), 6) AS l1_mean_disc
    FROM lineitem
    """,
    "L1/L2 column norms for feature scaling",
))

# K3 — response centering (O5; R/preProcessResponse.R:10-13)
_add(_same(
    "k03_center_response",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity - (SELECT AVG(l_quantity) FROM lineitem), 6) AS yc
    FROM lineitem
    WHERE l_orderkey < 40
    ORDER BY l_orderkey, l_linenumber
    """,
    "gaussian response centering y - mean(y)",
))

# K4 — gradient mat-vec X^T y (O11/O20; src/lambdaMax.h:50-53). Scaled sums.
_add(_same(
    "k04_xty_matvec",
    """
    SELECT ROUND(SUM(l_quantity * l_extendedprice) / 1000000, 4) AS g_qty,
           ROUND(SUM(l_discount * l_extendedprice) / 1000000, 6) AS g_disc,
           ROUND(SUM(l_tax * l_extendedprice) / 1000000, 6) AS g_tax
    FROM lineitem
    """,
    "X^T y matvec — the distributed gradient kernel",
))

# K5 — linear predictor + sigmoid (O33/O34; R/predict.R:105)
_add(_same(
    "k05_sigmoid_response",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(1 / (1 + EXP(-(0.1 * l_quantity - 2.0 * l_discount + 0.5 * l_tax))), 6) AS prob
    FROM lineitem
    WHERE l_orderkey < 40
    ORDER BY l_orderkey, l_linenumber
    """,
    "linear predictor through the binomial response link",
))

# K6 — binomial primal loss (O17; src/families/binomial.h:15-18)
_add(_same(
    "k06_binomial_primal",
    """
    SELECT ROUND(SUM(LN(1 + EXP(-(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE -1.0 END)
                                  * (0.1 * l_quantity - 2.0 * l_discount)))) / 1000, 6) AS primal_k
    FROM lineitem
    """,
    "logistic loss with the reference's {-1,+1} response coding",
))

# K7 — poisson primal sans lgamma (O18; src/families/poisson.h:15-18)
_add(_same(
    "k07_poisson_primal",
    """
    SELECT ROUND(-SUM(l_linenumber * (0.01 * l_quantity) - EXP(0.01 * l_quantity)) / 1000, 6) AS primal_k
    FROM lineitem
    """,
    "poisson negative log-likelihood kernel",
))

# K8 — gaussian primal / deviance (O16/O29; src/families/gaussian.h:21-24)
_add(_same(
    "k08_gaussian_primal",
    """
    SELECT ROUND(0.5 * SUM(POW(l_quantity - 0.001 * l_extendedprice, 2)) / 1000000, 6) AS primal_m
    FROM lineitem
    """,
    "0.5*||y - X beta||^2 at a fixed beta",
))

# K9 — softmax + argmax class (O36; R/predict.R:166-190)
_add(_same(
    "k09_softmax_argmax",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(EXP(lp1 - m) / (EXP(lp1 - m) + EXP(lp2 - m) + EXP(lp3 - m)), 6) AS p1,
           ROUND(EXP(lp2 - m) / (EXP(lp1 - m) + EXP(lp2 - m) + EXP(lp3 - m)), 6) AS p2,
           CASE WHEN lp1 >= lp2 AND lp1 >= lp3 THEN 'c1'
                WHEN lp2 >= lp3 THEN 'c2' ELSE 'c3' END AS cls
    FROM (
      SELECT l_orderkey, l_linenumber,
             0.1 * l_quantity - 1.0 * l_discount AS lp1,
             0.05 * l_quantity + 2.0 * l_tax AS lp2,
             0.08 * l_quantity - 0.5 * l_tax AS lp3,
             GREATEST(0.1 * l_quantity - 1.0 * l_discount,
                      0.05 * l_quantity + 2.0 * l_tax,
                      0.08 * l_quantity - 0.5 * l_tax) AS m
      FROM lineitem
      WHERE l_orderkey < 40
    ) t
    ORDER BY l_orderkey, l_linenumber
    """,
    "numerically-stable softmax + argmax class prediction",
))

# K10 — mse/mae scoring (O37; R/score.R:39-40)
_add(_same(
    "k10_mse_mae",
    """
    SELECT ROUND(AVG(POW(o_totalprice / 100000 - 1.5, 2)), 6) AS mse,
           ROUND(AVG(ABS(o_totalprice / 100000 - 1.5)), 6) AS mae
    FROM orders
    """,
    "mean-squared / mean-absolute error scoring",
))

# K11 — misclassification rate (O38; R/score.R:76)
_add(_same(
    "k11_misclass",
    """
    SELECT ROUND(AVG(CASE WHEN (o_totalprice > 150000) <> (o_orderpriority = '1-URGENT')
                          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6) AS misclass
    FROM orders
    """,
    "misclassification rate at the 0.5 threshold",
))

# K12 — rank-based AUC (O39; R/score.R:146-150). Mann-Whitney with
# deterministic key tie-break instead of the reference's runif jitter.
_add(_same(
    "k12_rank_auc",
    """
    SELECT ROUND((SUM(CASE WHEN pos = 1 THEN CAST(r AS DOUBLE) ELSE 0.0 END)
                  - (SUM(pos) * (SUM(pos) + 1)) / 2.0)
                 / (SUM(pos) * (COUNT(*) - SUM(pos))), 6) AS auc
    FROM (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r
      FROM orders
    ) t
    """,
    "exact AUC via the Mann-Whitney rank statistic",
))

# K13 — sorted-cumsum infeasibility (O24/O25; src/infeasibility.h:10-11).
# The per-partkey aggregated gradient plays the p-vector role.
_add(_same(
    "k13_infeasibility",
    """
    SELECT ROUND(GREATEST(MAX(cum), 0.0) / 1000, 6) AS infeas_k
    FROM (
      SELECT SUM(g - 50.0) OVER (ORDER BY g DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT l_partkey, ABS(SUM(l_extendedprice * l_discount)) / 1000 AS g
        FROM lineitem GROUP BY l_partkey
      ) gg
    ) c
    """,
    "max(cumsum(sort(|grad|) desc - lambda), 0) — FISTA infeasibility",
))

# K14 — strong-rule prefix size (O22; src/screening.h:16-33): largest k
# such that the running sum of (|g|_(i) + lambda_prev - 2*lambda) stays
# non-negative up to k, computed with the same ramp for every i.
_add(_same(
    "k14_strong_rule_prefix",
    """
    SELECT CAST(COALESCE(MAX(rn), 0) AS BIGINT) AS prefix_k
    FROM (
      SELECT ROW_NUMBER() OVER (ORDER BY g DESC, l_partkey) AS rn,
             SUM(g - 55.0) OVER (ORDER BY g DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT l_partkey, ABS(SUM(l_extendedprice * l_discount)) / 1000 AS g
        FROM lineitem GROUP BY l_partkey
      ) gg
    ) c
    WHERE cum >= 0
    """,
    "strong screening rule prefix scan",
))

# K15 — deterministic k-fold assignment (O42; replaces trainOwl.R:92-94
# shuffle). Knuth multiplicative hash so Spark and DuckDB agree exactly.
_add(_same(
    "k15_fold_assignment",
    """
    SELECT CAST(MOD(MOD(o_orderkey * 2654435761, 4294967296), 10) AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY MOD(MOD(o_orderkey * 2654435761, 4294967296), 10)
    ORDER BY fold
    """,
    "deterministic hash-based CV fold assignment",
))

# K16 — top-k by magnitude (O44 path display)
_add(_same(
    "k16_topk_magnitude",
    """
    SELECT l_partkey, ROUND(g / 1000, 6) AS g_k
    FROM (
      SELECT l_partkey, SUM(l_extendedprice * l_discount) AS g
      FROM lineitem GROUP BY l_partkey
    ) t
    ORDER BY ABS(g) DESC, l_partkey
    LIMIT 20
    """,
    "top-k coefficients by magnitude",
))

# K17 — null-model intercept, binomial (O21; src/families/binomial.h:31-39)
_add(_same(
    "k17_null_intercept",
    """
    SELECT ROUND(LN(p / (1 - p)), 6) AS b0
    FROM (
      SELECT LEAST(GREATEST(AVG(CASE WHEN l_returnflag = 'R' THEN CAST(1.0 AS DOUBLE)
                                     ELSE CAST(0.0 AS DOUBLE) END), 1e-9), 1 - 1e-9) AS p
      FROM lineitem
    ) t
    """,
    "binomial null-model intercept logit(clamp(mean))",
))

# K18 — grouped aggregation substrate (TPC-H Q1 shape)
_add(_same(
    "k18_grouped_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity) / 1000, 6) AS sum_qty_k,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "grouped aggregation — the substrate for every per-group reduction",
))

# K19 — join substrate (feature assembly across tables)
_add(_same(
    "k19_join_agg",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice) / 1000000, 4) AS rev_mm
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    "join + aggregate — cross-table feature assembly",
))

# K20 — events incremental scoring, batch-equivalent form (streaming
# extension §7; the streaming variant is tested in tests/test_streaming.py)
_add(_same(
    "k20_events_scoring",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(1 / (1 + EXP(-(0.01 * value - 1.0)))), 6) AS avg_score,
           ROUND(SUM(value) / 1000, 6) AS sum_value_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "incremental model scoring over the events table",
))


KERNELS: dict[str, Kernel] = {k.name: k for k in _KERNELS}
