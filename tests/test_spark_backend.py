"""Metamorphic: the distributed SparkBackend produces the same fits as
the LocalBackend (same operator contract, different execution). This is
the core 100 TB claim — data-sized work as Spark aggregations only."""

import numpy as np
import pandas as pd
import pytest

from golem_spark.path import owl
from golem_spark.predict import predict
from golem_spark.score import score
from tests.conftest import random_problem


def _to_spark(spark, x, y, label_name="label"):
    cols = {f"x{j}": x[:, j] for j in range(x.shape[1])}
    cols[label_name] = y
    return spark.createDataFrame(pd.DataFrame(cols)), [f"x{j}" for j in range(x.shape[1])]


@pytest.mark.parametrize("family,response", [
    ("gaussian", "gaussian"),
    ("binomial", "binomial"),
    ("poisson", "poisson"),
])
def test_spark_equals_local(spark, family, response):
    x, y, _ = random_problem(n=200, p=5, response=response, seed=21,
                             amplitude=0.5 if response == "poisson" else 3.0)
    df, feats = _to_spark(spark, x, y)
    local = owl(x, y, family=family, n_sigma=8)
    dist = owl(df=df, feature_cols=feats, label_col="label",
               family=family, n_sigma=8)
    K = min(local.n_sigma, dist.n_sigma)
    # local runs reference-parity FISTA, distributed runs prox-Newton;
    # both stop at tol_rel_gap=1e-5, so cross-solver agreement is ~1e-3
    # (the same tolerance the reference uses for cross-implementation
    # oracles, test-lasso.R:22-23)
    np.testing.assert_allclose(local.coefficients[:, :, :K],
                               dist.coefficients[:, :, :K], atol=2e-3)
    np.testing.assert_allclose(local.sigma[:K], dist.sigma[:K], rtol=1e-9)


def test_spark_multinomial_equals_local(spark):
    x, y, _ = random_problem(n=200, p=4, n_targets=2,
                             response="multinomial", seed=22)
    df, feats = _to_spark(spark, x, y.astype(int))
    local = owl(x, y.astype(int), family="multinomial", n_sigma=5)
    dist = owl(df=df, feature_cols=feats, label_col="label",
               family="multinomial", n_sigma=5)
    K = min(local.n_sigma, dist.n_sigma)
    np.testing.assert_allclose(local.coefficients[:, :, :K],
                               dist.coefficients[:, :, :K], atol=2e-3)


def test_spark_predict_and_score(spark):
    x, y, _ = random_problem(n=150, p=4, seed=23)
    df, feats = _to_spark(spark, x, y)
    fit = owl(x, y, family="gaussian", n_sigma=6)
    # Spark-side predictions equal numpy predictions
    pdf = (predict(fit, df=df, feature_cols=feats,
                   path_idx=fit.n_sigma - 1, type="response")
           .select("pred_0").toPandas())
    np_pred = predict(fit, x, path_idx=fit.n_sigma - 1, type="response")[:, 0]
    np.testing.assert_allclose(np.sort(pdf["pred_0"].to_numpy()),
                               np.sort(np_pred), atol=1e-9)
    # Spark-side scores equal numpy scores
    s_spark = score(fit, df=df, feature_cols=feats, label_col="label",
                    measure="mse")
    s_np = score(fit, x, y, measure="mse")
    np.testing.assert_allclose(s_spark, s_np, atol=1e-9)


def test_spark_auc_matches_numpy(spark):
    x, y, _ = random_problem(n=200, p=4, response="binomial", seed=24)
    df, feats = _to_spark(spark, x, y.astype(float))
    fit = owl(x, y.astype(float), family="binomial", n_sigma=5)
    a_spark = score(fit, df=df, feature_cols=feats, label_col="label", measure="auc")
    a_np = score(fit, x, y.astype(float), measure="auc")
    np.testing.assert_allclose(a_spark, a_np, atol=1e-12)


def test_spark_null_rejection(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "label": [1.0, 2.0, 3.0]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="missing"):
        owl(df=df, feature_cols=["a"], label_col="label", family="gaussian")


def test_lineitem_regression(spark):
    """Flagship distributed fit on real test data: predict l_quantity
    from price/discount/tax features of lineitem at sf0.001."""
    from golem_spark.session import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001")
    li = tables["lineitem"]
    fit = owl(df=li, feature_cols=["l_extendedprice", "l_discount", "l_tax"],
              label_col="l_quantity", family="gaussian", n_sigma=10)
    assert fit.n_sigma >= 1
    assert fit.coefficients.shape == (4, 1, fit.n_sigma)
    mse = score(fit, df=li, feature_cols=["l_extendedprice", "l_discount", "l_tax"],
                label_col="l_quantity", measure="mse")
    assert np.all(np.isfinite(mse))
