"""Property tests for the sparse CSR kernels (SparseArrowBackend static
helpers): on random sparse batches they must equal the dense numpy
formulations exactly. No Spark session needed — these are the
executor-side building blocks."""

import numpy as np
from hypothesis import given, settings, strategies as st

from golem_spark.backends import SparseArrowBackend


@st.composite
def sparse_batch(draw):
    nrow = draw(st.integers(1, 30))
    p = draw(st.integers(1, 12))
    m = draw(st.integers(1, 3))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    density = draw(st.floats(0.0, 1.0))
    X = rng.standard_normal((nrow, p)) * (rng.random((nrow, p)) < density)
    rows_l, cols_l, vals_l = [], [], []
    for i in range(nrow):
        nz = np.flatnonzero(X[i])
        rows_l.extend([i] * len(nz))
        cols_l.extend(nz.tolist())
        vals_l.extend(X[i, nz].tolist())
    rows = np.asarray(rows_l, dtype=np.int64)
    cols = np.asarray(cols_l, dtype=np.int64)
    vals = np.asarray(vals_l, dtype=np.float64)
    G = rng.standard_normal((nrow, m))
    w = np.abs(rng.standard_normal(nrow)) + 0.1
    return nrow, p, m, X, rows, cols, vals, G, w


@given(sparse_batch(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_sparse_lp_matches_dense(batch, intercept):
    nrow, p, m, X, rows, cols, vals, G, w = batch
    b = np.linspace(-1, 1, (p + (1 if intercept else 0)) * m).reshape(-1, m)
    lp = SparseArrowBackend._lp(nrow, rows, cols, vals, b, intercept)
    expect = (b[0][None, :] + X @ b[1:]) if intercept else X @ b
    np.testing.assert_allclose(lp, expect, rtol=1e-12, atol=1e-12)


@given(sparse_batch(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_sparse_xtg_matches_dense(batch, intercept):
    nrow, p, m, X, rows, cols, vals, G, w = batch
    out = SparseArrowBackend._xtg(p, rows, cols, vals, G, intercept)
    expect = X.T @ G
    if intercept:
        expect = np.vstack([G.sum(axis=0), expect])
    np.testing.assert_allclose(out, expect, rtol=1e-12, atol=1e-12)


@given(sparse_batch(), st.booleans(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_sparse_gram_matches_dense(batch, intercept, weighted):
    nrow, p, m, X, rows, cols, vals, G, w = batch
    p_total = p + (1 if intercept else 0)
    H = np.zeros((p_total, p_total))
    SparseArrowBackend._accum_gram(H, nrow, rows, cols, vals,
                                   w if weighted else None, intercept)
    Xi = np.hstack([np.ones((nrow, 1)), X]) if intercept else X
    W = w if weighted else np.ones(nrow)
    expect = (Xi * W[:, None]).T @ Xi
    np.testing.assert_allclose(H, expect, rtol=1e-9, atol=1e-9)
