"""Wide-p (Arrow-batched) backend: the scale path for p beyond what
Catalyst expression lists handle. Metamorphic: arrow == expression ==
local."""

import numpy as np
import pandas as pd
import pytest

from golem_spark.backends import ArrowSparkBackend, SparkBackend, build_spark_backend
from golem_spark.families import get_family
from golem_spark.path import owl
from tests.conftest import random_problem


def _to_spark(spark, x, y):
    cols = {f"x{j}": x[:, j] for j in range(x.shape[1])}
    cols["label"] = y
    return spark.createDataFrame(pd.DataFrame(cols)), [f"x{j}" for j in range(x.shape[1])]


def test_arrow_backend_matches_expression_backend(spark):
    x, y, _ = random_problem(n=150, p=6, response="binomial", seed=60)
    df, feats = _to_spark(spark, x, y)
    be_expr, _ = build_spark_backend(df, feats, "label", "binomial")
    be_arrow = ArrowSparkBackend(be_expr.df, be_expr.feat_cols, be_expr.y_cols,
                                 get_family("binomial"), True, be_expr.n,
                                 persist=False)
    beta = np.linspace(-0.5, 0.5, 7).reshape(7, 1)
    p1, d1, g1 = be_expr.eval(beta)
    p2, d2, g2 = be_arrow.eval(beta)
    assert abs(p1 - p2) < 1e-8 * max(1, abs(p1))
    assert abs(d1 - d2) < 1e-6 * max(1, abs(d1))
    np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(be_expr.gram(), be_arrow.gram(), rtol=1e-9, atol=1e-9)
    ph1, dh1, gh1, H1 = be_expr._eval_hess_expr(beta)
    ph2, dh2, gh2, H2 = be_arrow.eval_hess(beta)
    np.testing.assert_allclose(H1, H2, rtol=1e-9, atol=1e-9)
    be_expr.unpersist()


def test_multinomial_hess_arrow_matches_expression(spark):
    rng = np.random.RandomState(63)
    x = rng.randn(200, 4)
    y = rng.randint(0, 3, size=200)  # 3 classes
    df, feats = _to_spark(spark, x, y)
    be, _ = build_spark_backend(df, feats, "label", "multinomial")
    m = be.m
    beta = np.linspace(-0.3, 0.3, be.p_total * m).reshape(be.p_total, m)
    p1, d1, g1, H1 = be._eval_hess_expr(beta)
    p2, d2, g2, H2 = be.eval_hess(beta)  # Arrow route
    assert abs(p1 - p2) < 1e-8 * max(1, abs(p1))
    assert abs(d1 - d2) < 1e-6 * max(1, abs(d1))
    np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(H1, H2, rtol=1e-9, atol=1e-9)
    be.unpersist()


@pytest.mark.parametrize("family,response", [("gaussian", "gaussian"),
                                             ("binomial", "binomial")])
def test_wide_p_fit_matches_local(spark, family, response):
    x, y, _ = random_problem(n=260, p=210, q=0.01, response=response, seed=61)
    df, feats = _to_spark(spark, x, y)
    local = owl(x, y, family=family, n_sigma=3, lambda_min_ratio=1e-1)
    dist = owl(df=df, feature_cols=feats, label_col="label",
               family=family, n_sigma=3, lambda_min_ratio=1e-1)
    K = min(local.n_sigma, dist.n_sigma)
    np.testing.assert_allclose(local.coefficients[:, :, :K],
                               dist.coefficients[:, :, :K], atol=5e-3)


def test_tree_reduce_collect_partials_bitwise(spark, monkeypatch):
    """GOLEM_SPARK_TREE_REDUCE=1 selects the cluster-scale partial merge
    (full-parallel map + repartition-sum stage, driver ingress O(fanout)
    rows). This exercises the merge stage FOR SURE — out_len crosses the
    1 MiB engage threshold — and the values are integer-valued doubles,
    so tree-grouped and direct summation are BITWISE equal (exact in
    float64 up to 2^53; no rounding-order escape hatch)."""
    import pandas as pd

    from golem_spark.backends import (_collect_partials,
                                      _merge_partials_stage)

    out_len = 140_000  # > (1 << 20) / 8 -> merge stage engages
    n_parts = 12
    rows = [np.arange(out_len, dtype=np.float64) % 97 + i
            for i in range(n_parts)]
    expected = np.sum(rows, axis=0)
    df = spark.createDataFrame(
        pd.DataFrame({"part": [r.tolist() for r in rows]})).repartition(6)

    monkeypatch.delenv("GOLEM_SPARK_TREE_REDUCE", raising=False)
    direct = _collect_partials(df, out_len)
    monkeypatch.setenv("GOLEM_SPARK_TREE_REDUCE", "1")
    tree = _collect_partials(df, out_len)
    # merge stage really ran: the staged frame collapses to <= fanout rows
    assert _merge_partials_stage(df, out_len).count() <= 4

    assert np.array_equal(direct, expected)
    assert np.array_equal(tree, expected)
    assert np.array_equal(tree, direct)


def test_wide_p_fit_matches_under_tree_reduce(spark, monkeypatch):
    """Fit-level metamorphic twin of the unit check above: the wide-p
    Arrow DENSE backend path (p=250 routes to ArrowSparkBackend) under
    GOLEM_SPARK_TREE_REDUCE=1 reproduces the default fit. (The sparse
    twin lives in test_sparse_backend.py::
    test_tree_reduce_partials_matches_default.)"""
    x, y, _ = random_problem(n=260, p=250, q=0.01, seed=64)
    df, feats = _to_spark(spark, x, y)
    monkeypatch.delenv("GOLEM_SPARK_TREE_REDUCE", raising=False)
    base = owl(df=df, feature_cols=feats, label_col="label",
               family="gaussian", n_sigma=3, lambda_min_ratio=1e-1)
    monkeypatch.setenv("GOLEM_SPARK_TREE_REDUCE", "1")
    tree = owl(df=df, feature_cols=feats, label_col="label",
               family="gaussian", sigma=base.sigma,
               lambda_min_ratio=1e-1)
    np.testing.assert_allclose(tree.coefficients, base.coefficients,
                               rtol=1e-7, atol=1e-9)


def test_wide_p_uses_arrow_backend(spark):
    x, y, _ = random_problem(n=120, p=250, seed=62)
    df, feats = _to_spark(spark, x, y)
    be, _ = build_spark_backend(df, feats, "label", "gaussian")
    try:
        assert isinstance(be, ArrowSparkBackend)
        # subsetting to a small active set falls back to expressions
        sub = be.subset(np.arange(5))
        assert type(sub) is SparkBackend
    finally:
        be.unpersist()


def test_eval_multi_bitwise_matches_single_passes(spark):
    """The fused multi-beta pass (warm-point prefetch, r14) must return
    EXACTLY what the per-beta passes return: same closures over the
    same batch grouping means the per-element float summation sequence
    is identical, so the contract is bitwise, not approximate."""
    for fam, m in (("binomial", 1), ("poisson", 1), ("multinomial", 2)):
        if fam == "binomial":
            x, y, _ = random_problem(n=180, p=9, response="binomial", seed=71)
        elif fam == "poisson":
            x, y, _ = random_problem(n=180, p=9, seed=72)
            y = np.floor(np.abs(y) * 3).astype(float)
        else:
            x, y, _ = random_problem(n=180, p=9, seed=73)
            y = (np.digitize(y, np.quantile(y, [0.33, 0.66]))).astype(float)
        df, feats = _to_spark(spark, x, y)
        be, _ = build_spark_backend(df, feats, "label", fam)
        try:
            view = be._arrow_view() if type(be) is SparkBackend else be
            rng = np.random.default_rng(17)
            betas = [rng.standard_normal((view.p_total, view.m)) * 0.1
                     for _ in range(3)]
            singles = [view.eval(b) for b in betas]
            fused = view.eval_multi(betas)
            for (p1, d1, g1), (p2, d2, g2) in zip(singles, fused):
                assert p1 == p2 and d1 == d2, fam
                assert np.array_equal(g1, g2), fam
            singles_h = [view.eval_hess(b) for b in betas]
            fused_h = view.eval_hess_multi(betas)
            for (p1, d1, g1, H1), (p2, d2, g2, H2) in zip(singles_h, fused_h):
                assert p1 == p2 and d1 == d2, fam
                assert np.array_equal(g1, g2), fam
                assert np.array_equal(H1, H2), fam
        finally:
            be.unpersist()


def test_sparse_eval_multi_bitwise_matches_single_passes(spark):
    """Sparse twin of the fused-pass bitwise contract."""
    from pyspark.sql import functions as F

    from golem_spark.backends import build_sparse_backend
    from golem_spark.session import load_tables

    li = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    for fam in ("binomial", "poisson", "multinomial"):
        if fam == "binomial":
            lab = F.when(F.col("l_returnflag") == "R", "R").otherwise("o")
        elif fam == "multinomial":
            lab = F.col("l_returnflag")
        else:
            lab = F.col("l_quantity")
        sdf = li.select(
            F.array((F.col("l_linenumber") - 1).cast("int")).alias("idx"),
            F.array(F.lit(1.0)).alias("val"), lab.alias("label"))
        be, _ = build_sparse_backend(sdf, "idx", "val", "label", fam, 7,
                                     intercept=True)
        try:
            rng = np.random.default_rng(23)
            betas = [rng.standard_normal((be.p_total, be.m)) * 0.1
                     for _ in range(3)]
            singles = [be.eval(b) for b in betas]
            for (p1, d1, g1), (p2, d2, g2) in zip(singles,
                                                  be.eval_multi(betas)):
                assert p1 == p2 and d1 == d2, fam
                assert np.array_equal(g1, g2), fam
            singles_h = [be.eval_hess(b) for b in betas]
            for (p1, d1, g1, H1), (p2, d2, g2, H2) in zip(
                    singles_h, be.eval_hess_multi(betas)):
                assert p1 == p2 and d1 == d2, fam
                assert np.array_equal(g1, g2), fam
                assert np.array_equal(H1, H2), fam
        finally:
            be.unpersist()
