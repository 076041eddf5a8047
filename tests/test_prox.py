"""Sorted-L1 prox unit tests — the hardest 60 lines in the project
(SURVEY §7 step 4). Oracle: a slow independent pooling implementation +
subgradient optimality conditions + brute-force grid on tiny vectors."""

import numpy as np
import pytest

from golem_spark.prox import prox_sorted_l1, prox_sorted_l1_reference, sorted_l1_norm


def objective(x, v, lam):
    return 0.5 * np.sum((x - v) ** 2) + sorted_l1_norm(x, lam)


@pytest.mark.parametrize("seed", range(20))
def test_matches_slow_reference(seed):
    rng = np.random.default_rng(seed)
    p = rng.integers(1, 40)
    v = rng.standard_normal(p) * rng.choice([0.1, 1.0, 10.0])
    lam = np.sort(np.abs(rng.standard_normal(p)))[::-1]
    fast = prox_sorted_l1(v, lam)
    slow = prox_sorted_l1_reference(v, lam)
    np.testing.assert_allclose(fast, slow, atol=1e-12)


@pytest.mark.parametrize("seed", range(20))
def test_is_a_minimum(seed):
    """Random perturbations never beat the prox output."""
    rng = np.random.default_rng(100 + seed)
    p = int(rng.integers(2, 15))
    v = rng.standard_normal(p) * 3
    lam = np.sort(rng.random(p))[::-1] * 2
    x = prox_sorted_l1(v, lam)
    f0 = objective(x, v, lam)
    for _ in range(200):
        pert = x + rng.standard_normal(p) * rng.choice([1e-4, 1e-2, 0.5])
        assert objective(pert, v, lam) >= f0 - 1e-10


def test_soft_threshold_special_case():
    """Constant lambda -> ordinary soft thresholding (SLOPE == lasso)."""
    rng = np.random.default_rng(7)
    v = rng.standard_normal(50) * 2
    lam = np.full(50, 0.7)
    expected = np.sign(v) * np.maximum(np.abs(v) - 0.7, 0.0)
    np.testing.assert_allclose(prox_sorted_l1(v, lam), expected, atol=1e-12)


def test_zero_lambda_is_identity():
    v = np.array([3.0, -1.0, 0.5])
    np.testing.assert_allclose(prox_sorted_l1(v, np.zeros(3)), v)


def test_huge_lambda_zeroes():
    v = np.array([3.0, -1.0, 0.5])
    lam = np.array([100.0, 50.0, 10.0])
    np.testing.assert_allclose(prox_sorted_l1(v, lam), np.zeros(3))


def test_clustering_behavior():
    """Close coefficients are pooled to equal magnitude — SLOPE's
    signature behavior under a steep lambda sequence."""
    v = np.array([5.0, 4.9, -4.95, 0.1])
    lam = np.array([3.0, 2.0, 1.0, 0.5])
    x = prox_sorted_l1(v, lam)
    mags = np.abs(x[:3])
    assert np.ptp(mags) < 1e-9
    assert np.sign(x[2]) == -1.0


def test_preserves_shape_and_sign():
    rng = np.random.default_rng(11)
    v = rng.standard_normal((4, 3))
    lam = np.sort(rng.random(12))[::-1]
    x = prox_sorted_l1(v, lam)
    assert x.shape == (4, 3)
    nz = x != 0
    assert np.all(np.sign(x[nz]) == np.sign(v[nz]))


# -- property-based (hypothesis) -------------------------------------------
# mirrors the reference's randomized-problem test style (SURVEY §5.3)
# with adversarial inputs: ties, zeros, flat and steep lambda ramps.

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_prox_properties(data):
    p = data.draw(st.integers(1, 25))
    v = np.asarray(data.draw(st.lists(
        st.floats(-50, 50, allow_nan=False, width=64), min_size=p, max_size=p)))
    lam = np.sort(np.asarray(data.draw(st.lists(
        st.floats(0, 20, allow_nan=False, width=64), min_size=p, max_size=p))))[::-1]
    x = prox_sorted_l1(v, lam)
    # 1) agrees with the slow independent pooling implementation
    np.testing.assert_allclose(x, prox_sorted_l1_reference(v, lam), atol=1e-10)
    # 2) shrinkage: never grows a magnitude
    assert np.all(np.abs(x) <= np.abs(v) + 1e-12)
    # 3) sign consistency
    assert np.all(x * v >= -1e-12)
    # 4) magnitude order preserved (prox commutes with the sort)
    order = np.argsort(-np.abs(v), kind="stable")
    mags = np.abs(x)[order]
    assert np.all(np.diff(mags) <= 1e-12)
    # 5) no-worse objective than the 0 and identity candidates
    f = objective(x, v, lam)
    assert f <= objective(np.zeros(p), v, lam) + 1e-9
    assert f <= objective(v.copy(), v, lam) + 1e-9


def test_kron_structured_subproblem_equals_dense():
    """The kron-structured fixed-Hessian path (_KronH + _kron_solve,
    used by the multinomial Bohning and multi-target gaussian
    majorizations) solves the SAME subproblem as the materialized
    np.kron dense path — matvec, (H + rho I)^-1, and the full ADMM
    subproblem all agree. This is the metamorphic guard for the
    structured factorization that removes the O((p*m)^3) inverse per
    (path point x rho rebalance) from the wide multinomial fits."""
    from golem_spark.solvers import _KronH, _kron_solve, _prox_quadratic

    rng = np.random.default_rng(7)
    # m spans every production shape AND beyond: Bohning target factors
    # at m = 2/3/5 (3/4/6-class multinomial), identity at m = 4
    # (4-target gaussian), and a random PSD S at m = 6 — the algebra is
    # m-generic and this pins it past the m = 2 production uses
    cases = [(2, 1, "bohning"), (3, 0, "bohning"), (5, 1, "bohning"),
             (4, 0, "identity"), (6, 1, "random_psd")]
    for m, pen0, s_kind in cases:
        p = 37
        X = rng.normal(size=(150, p))
        G = X.T @ X / 150
        if s_kind == "bohning":
            B = np.eye(m) - np.ones((m, m)) / (m + 1)
        elif s_kind == "identity":
            B = 2.0 * np.eye(m)
        else:
            R = rng.normal(size=(m, m))
            B = R @ R.T / m + 0.1 * np.eye(m)
        H_dense = 0.5 * np.kron(B, G)
        kh = _KronH(G, 0.5 * B)

        v = rng.normal(size=p * m)
        np.testing.assert_allclose(kh.matvec(v), H_dense @ v,
                                   atol=1e-12, rtol=1e-12)
        eig = kh.eig(None)
        for rho in (1e-3, 0.7, 50.0):
            q = rng.normal(size=p * m)
            ref = np.linalg.solve(H_dense + rho * np.eye(p * m), q)
            np.testing.assert_allclose(_kron_solve(eig, rho, q, p, m),
                                       ref, atol=1e-9)

        lin = rng.normal(size=(p, m))
        beta0 = rng.normal(size=(p, m)) * 0.1
        lam = np.sort(rng.uniform(0.05, 0.5,
                                  size=(p - pen0) * m))[::-1].copy()
        d_dense = _prox_quadratic(H_dense, lin, beta0, lam, pen0,
                                  cache={}, fixed_h=True)
        d_kron = _prox_quadratic(kh, lin, beta0, lam, pen0,
                                 cache={}, fixed_h=True)
        np.testing.assert_allclose(d_kron, d_dense, atol=1e-6)
