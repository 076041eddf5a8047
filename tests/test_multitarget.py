"""Multi-target (multi-task) gaussian fits — the reference's student
role (R/data.R:151-155; coefficient cube p x m x K, src/owl.cpp:88).

Statistical oracle: at sigma -> 0 the sorted-L1 penalty vanishes and each
target's coefficients solve its own ordinary least squares problem, so a
multi-target fit must match per-target OLS column by column.
"""

import numpy as np
import pytest

from golem_spark.data import random_problem
from golem_spark.path import owl
from golem_spark.predict import predict
from golem_spark.score import score


def _ols(x, y):
    """[intercept, coefs] for y ~ 1 + x via least squares."""
    A = np.hstack([np.ones((x.shape[0], 1)), x])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    return coef


def test_multitarget_ols_oracle():
    x, y, _ = random_problem(n=150, p=5, n_targets=2, seed=101)
    assert y.shape == (150, 2)
    fit = owl(x, y, family="gaussian", sigma=[1e-9])
    assert fit.coefficients.shape == (6, 2, 1)
    for t in range(2):
        expect = _ols(x, y[:, t])
        np.testing.assert_allclose(fit.coefficients[:, t, 0], expect,
                                   rtol=1e-4, atol=1e-5)


def test_multitarget_ols_oracle_m4():
    """4-target gaussian (m = 4 matrix-RHS ADMM; m beyond the m = 2
    production bench shape — VERDICT r11 item 6): at sigma -> 0 each
    target's column must solve its own OLS problem."""
    x, y, _ = random_problem(n=200, p=6, n_targets=4, seed=106)
    assert y.shape == (200, 4)
    fit = owl(x, y, family="gaussian", sigma=[1e-9])
    assert fit.coefficients.shape == (7, 4, 1)
    for t in range(4):
        expect = _ols(x, y[:, t])
        np.testing.assert_allclose(fit.coefficients[:, t, 0], expect,
                                   rtol=1e-4, atol=1e-5)


def test_multitarget_path_and_scoring():
    x, y, _ = random_problem(n=120, p=6, n_targets=3, seed=102)
    fit = owl(x, y, family="gaussian", n_sigma=8)
    assert fit.coefficients.shape[:2] == (7, 3)
    assert np.all(np.isfinite(fit.coefficients))
    # deviance ratio increases (more fit) as sigma decreases
    assert fit.deviance_ratio[-1] >= fit.deviance_ratio[0]
    pred = predict(fit, x, path_idx=fit.n_sigma - 1)
    assert pred.shape == (120, 3)
    s = score(fit, x, y, measure="mse")
    assert np.all(np.isfinite(s))
    assert s[-1] <= s[0] + 1e-9  # denser path point fits no worse


def test_multitarget_penalty_couples_targets():
    """The sorted-L1 penalty ranks |beta| across ALL p*m entries, so a
    strong signal in target 0 changes which target-1 coefficients
    survive — the fit is genuinely joint, not per-column."""
    x, y, _ = random_problem(n=100, p=4, n_targets=2, seed=103)
    fit_joint = owl(x, y, family="gaussian", n_sigma=6)
    # compare against stacking two independent single-target paths at
    # matched sigma: the joint lambda sequence has length p*m, the
    # marginal one length p, so solutions differ at moderate sigma
    sig = fit_joint.sigma[min(2, fit_joint.n_sigma - 1)]
    fit_t0 = owl(x, y[:, 0], family="gaussian", sigma=[sig])
    joint_at = owl(x, y, family="gaussian", sigma=[sig])
    assert not np.allclose(joint_at.coefficients[:, 0, 0],
                           fit_t0.coefficients[:, 0, 0], atol=1e-8)


def test_multitarget_spark_matches_local(spark):
    x, y, _ = random_problem(n=200, p=4, n_targets=2, seed=104)
    import pandas as pd

    pdf = pd.DataFrame(x, columns=[f"f{j}" for j in range(4)])
    pdf["ya"] = y[:, 0]
    pdf["yb"] = y[:, 1]
    df = spark.createDataFrame(pdf)
    # pin screening so both backends follow the identical iteration
    # path (auto mode disables it for narrow distributed fits)
    fit_s = owl(df=df, feature_cols=[f"f{j}" for j in range(4)],
                label_col=["ya", "yb"], family="gaussian", n_sigma=6,
                screening=True)
    fit_l = owl(x, y, family="gaussian", n_sigma=6, screening=True)
    K = min(fit_s.n_sigma, fit_l.n_sigma)
    np.testing.assert_allclose(fit_s.coefficients[:, :, :K],
                               fit_l.coefficients[:, :, :K],
                               rtol=1e-5, atol=1e-6)
