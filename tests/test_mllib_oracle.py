"""Cross-checks against Spark MLlib's own GLM implementations — a third
independent oracle (after numpy OLS/IRLS and DuckDB kernels), mirroring
the reference's glm/glmnet comparisons (SURVEY §5).

At sigma -> 0 the SLOPE path point is the unregularized GLM, so
coefficients must match MLlib's LinearRegression / LogisticRegression /
GeneralizedLinearRegression to solver tolerance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GeneralizedLinearRegression, LinearRegression

from golem_spark.data import random_problem
from golem_spark.path import owl


def _prep(spark, x, y):
    pdf = pd.DataFrame({f"x{j}": x[:, j] for j in range(x.shape[1])})
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    feats = [f"x{j}" for j in range(x.shape[1])]
    vec = VectorAssembler(inputCols=feats, outputCol="features").transform(df)
    return df, vec, feats


def test_gaussian_matches_mllib_linear_regression(spark):
    x, y, _ = random_problem(n=300, p=5, seed=90)
    df, vec, feats = _prep(spark, x, y)
    ours = owl(df=df, feature_cols=feats, label_col="label",
               family="gaussian", sigma=1e-7)
    lr = LinearRegression(featuresCol="features", labelCol="label",
                          regParam=0.0).fit(vec)
    oracle = np.concatenate([[lr.intercept], np.asarray(lr.coefficients)])
    np.testing.assert_allclose(ours.coefficients[:, 0, 0], oracle, atol=1e-3)


def test_binomial_matches_mllib_logistic_regression(spark):
    x, y, _ = random_problem(n=500, p=4, response="binomial", seed=91)
    df, vec, feats = _prep(spark, x, y.astype(float))
    ours = owl(df=df, feature_cols=feats, label_col="label",
               family="binomial", sigma=1e-6)
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            regParam=0.0, tol=1e-10).fit(vec)
    oracle = np.concatenate([[lr.intercept], np.asarray(lr.coefficients)])
    np.testing.assert_allclose(ours.coefficients[:, 0, 0], oracle, atol=2e-3)


def test_poisson_matches_mllib_glr(spark):
    x, y, _ = random_problem(n=300, p=4, response="poisson", seed=92,
                             amplitude=0.5)
    df, vec, feats = _prep(spark, x, y.astype(float))
    ours = owl(df=df, feature_cols=feats, label_col="label",
               family="poisson", sigma=1e-6)
    glr = GeneralizedLinearRegression(featuresCol="features", labelCol="label",
                                      family="poisson", link="log",
                                      regParam=0.0, tol=1e-10).fit(vec)
    oracle = np.concatenate([[glr.intercept], np.asarray(glr.coefficients)])
    np.testing.assert_allclose(ours.coefficients[:, 0, 0], oracle, atol=1e-3)


def test_multinomial_matches_mllib_softmax(spark):
    """MLlib uses the symmetric m-class pivot; our full-rank (m-1)
    parameterization matches after re-centering (the reference applies
    the same trick, test-multinomial.R:27-28)."""
    x, y, _ = random_problem(n=500, p=4, n_targets=2,
                             response="multinomial", seed=93)
    df, vec, feats = _prep(spark, x, y.astype(int))
    ours = owl(df=df, feature_cols=feats, label_col="label",
               family="multinomial", sigma=1e-6)
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            family="multinomial", regParam=0.0, tol=1e-10).fit(vec)
    # ours: full-rank (m-1) vs reference class m; MLlib: symmetric
    # m-class. Convert MLlib to full-rank by subtracting the last class.
    mat = lr.coefficientMatrix.toArray()       # (3, p)
    icpt = np.asarray(lr.interceptVector)      # (3,)
    oracle = np.zeros((5, 2))
    for t in range(2):
        oracle[0, t] = icpt[t] - icpt[2]
        oracle[1:, t] = mat[t] - mat[2]
    np.testing.assert_allclose(ours.coefficients[:, :, 0], oracle, atol=5e-3)
