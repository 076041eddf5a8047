"""Local sparse input mode: owl(x, y, sparse_p=p) with x an iterable of
per-row (indices, values) pairs — the reference's in-memory dgCMatrix
mode (R/owl.R:353-357, tests/testthat/test-sparsity.R), run through the
SAME pure-numpy CSR kernels as the distributed sparse backend (no
scipy). Metamorphic: local-sparse == local-dense at density 0.5, and
local-sparse == distributed-sparse (identical solver + kernels)."""

import numpy as np
import pandas as pd
import pytest

from golem_spark.path import owl
from tests.conftest import random_problem


def _to_pairs(X):
    return [(np.flatnonzero(X[i]), X[i][np.flatnonzero(X[i])])
            for i in range(X.shape[0])]


@pytest.fixture(scope="module")
def half_dense():
    x, y, _ = random_problem(n=300, p=20, density=0.5, seed=71)
    return x, y


def test_local_sparse_equals_dense_gaussian(half_dense):
    """Both route to sufficient-stats ADMM: exact match."""
    X, y = half_dense
    fs = owl(_to_pairs(X), y, sparse_p=20, family="gaussian", n_sigma=5)
    fl = owl(X, y, family="gaussian", n_sigma=5, center=False, scale="l2")
    K = min(fs.n_sigma, fl.n_sigma)
    np.testing.assert_allclose(fs.coefficients[:, :, :K],
                               fl.coefficients[:, :, :K], atol=1e-9)
    np.testing.assert_allclose(fs.sigma[:K], fl.sigma[:K], rtol=1e-12)


@pytest.mark.parametrize("family,response", [("binomial", "binomial"),
                                             ("poisson", "poisson"),
                                             ("multinomial", "multinomial")])
def test_local_sparse_equals_dense(family, response):
    """density-0.5 metamorphic (mirrors test-sparsity.R:1-23): sparse
    prox-Newton vs dense FISTA agree to solver tolerance."""
    x, y, _ = random_problem(n=250, p=12, density=0.5, response=response,
                             n_targets=2 if family == "multinomial" else 1,
                             seed=72)
    if family == "binomial":
        y = np.where(y > 0, "b", "a")
    elif family == "multinomial":
        y = np.asarray([str(v) for v in y])
    # tight tolerances: prox-Newton (sparse) and FISTA (dense) must meet
    # at the same optimum once both duality gaps are driven down
    fs = owl(_to_pairs(x), y, sparse_p=12, family=family, n_sigma=4,
             tol_rel_gap=1e-9, tol_infeas=1e-6)
    fd = owl(x, y, family=family, n_sigma=4, center=False, scale="l2",
             tol_rel_gap=1e-9, tol_infeas=1e-6)
    K = min(fs.n_sigma, fd.n_sigma)
    np.testing.assert_allclose(fs.coefficients[:, :, :K],
                               fd.coefficients[:, :, :K],
                               rtol=1e-3, atol=5e-3)


def test_local_sparse_equals_distributed_sparse(spark, half_dense):
    """Identical CSR kernels + solver on both plumbing paths: tight."""
    X, y = half_dense
    n = X.shape[0]
    idx = [list(np.flatnonzero(X[i]).astype(int)) for i in range(n)]
    val = [[float(v) for v in X[i, np.flatnonzero(X[i])]] for i in range(n)]
    df = spark.createDataFrame(pd.DataFrame({"idx": idx, "val": val,
                                             "label": list(y)}))
    fd = owl(df=df, sparse_features=("idx", "val"), sparse_p=20,
             label_col="label", family="gaussian", n_sigma=5)
    fl = owl(_to_pairs(X), y, sparse_p=20, family="gaussian", n_sigma=5)
    K = min(fd.n_sigma, fl.n_sigma)
    np.testing.assert_allclose(fl.coefficients[:, :, :K],
                               fd.coefficients[:, :, :K],
                               rtol=1e-9, atol=1e-9)


def test_local_sparse_center_rejected(half_dense):
    X, y = half_dense
    with pytest.raises(ValueError, match="centering"):
        owl(_to_pairs(X), y, sparse_p=20, family="gaussian", center=True)


def test_local_sparse_bad_index_rejected(half_dense):
    X, y = half_dense
    pairs = _to_pairs(X)
    pairs[3] = (np.array([0, 25]), np.array([1.0, 2.0]))  # 25 >= p=20
    with pytest.raises(ValueError, match="outside"):
        owl(pairs, y, sparse_p=20, family="gaussian")


def test_local_sparse_ragged_pair_rejected(half_dense):
    X, y = half_dense
    pairs = _to_pairs(X)
    pairs[0] = (np.array([0, 1]), np.array([1.0]))
    with pytest.raises(ValueError, match="equal length"):
        owl(pairs, y, sparse_p=20, family="gaussian")


def test_local_sparse_nan_value_rejected(half_dense):
    X, y = half_dense
    pairs = _to_pairs(X)
    pairs[1] = (np.array([2]), np.array([np.nan]))
    with pytest.raises(ValueError, match="non-finite"):
        owl(pairs, y, sparse_p=20, family="gaussian")
