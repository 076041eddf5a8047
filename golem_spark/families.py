"""GLM families: primal/dual losses, pseudo-gradients, null models.

Numpy implementations drive the solvers (both the local backend and the
driver side of the distributed backend — the distributed backend computes
the same quantities as Spark aggregations, see backends.py).

Semantics match the reference exactly (citations per class):
- gaussian: /root/reference/src/families/gaussian.h:21-45
- binomial (y in {-1,+1}): src/families/binomial.h:15-39
- poisson: src/families/poisson.h:15-33
- multinomial (full-rank m-1 softmax): src/families/multinomial.h:15-51
Response encoding mirrors R/preProcessResponse.R:1-104.
"""

from __future__ import annotations

import math

import numpy as np

_lgamma = np.vectorize(math.lgamma, otypes=[np.float64])

# exp/log clamped like Armadillo's trunc_exp/trunc_log (avoid inf/nan in
# the solver; values this extreme are already divergent anyway).
_LOG_MAX = 709.0
_TINY = np.finfo(np.float64).tiny


def trunc_exp(x):
    return np.exp(np.minimum(x, _LOG_MAX))


def trunc_log(x):
    return np.log(np.maximum(x, _TINY))


class Family:
    name = "base"

    def primal(self, y: np.ndarray, lp: np.ndarray) -> float:
        raise NotImplementedError

    def dual(self, y: np.ndarray, lp: np.ndarray) -> float:
        raise NotImplementedError

    def pseudo_gradient(self, y: np.ndarray, lp: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def fit_null_model(self, y: np.ndarray) -> np.ndarray:
        """Intercept-only coefficients, one per target column."""
        raise NotImplementedError

    def preprocess_response(self, y) -> dict:
        """family-specific response encoding; returns dict with keys
        y (n×m), y_center (m,), y_scale (m,), n_classes, n_targets,
        class_names."""
        raise NotImplementedError


class Gaussian(Family):
    name = "gaussian"

    def primal(self, y, lp):
        r = y - lp
        return 0.5 * float(np.sum(r * r))

    def dual(self, y, lp):
        return 0.5 * float(np.sum(y * y)) - 0.5 * float(np.sum(lp * lp))

    def pseudo_gradient(self, y, lp):
        return lp - y

    def fit_null_model(self, y):
        return np.mean(y, axis=0)

    def preprocess_response(self, y):
        # n x m responses are first-class: the reference core carries a
        # p x m x K coefficient cube (src/owl.cpp:88) and ships the
        # multi-task student dataset (R/data.R:151-155); each target is
        # centered by its own mean.
        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 1:
            y = y.reshape(-1, 1)
        elif y.ndim != 2:
            raise ValueError("gaussian response must be a vector or an n x m matrix")
        m = y.shape[1]
        y_center = np.mean(y, axis=0)
        return {
            "y": y - y_center,
            "y_center": y_center,
            "y_scale": np.ones(m),
            "n_classes": 1,
            "n_targets": m,
            "class_names": None,
        }


class Binomial(Family):
    name = "binomial"

    def primal(self, y, lp):
        return float(np.sum(np.log1p(trunc_exp(-y * lp))))

    def dual(self, y, lp):
        r = 1.0 / (1.0 + trunc_exp(y * lp))
        return float(np.sum((r - 1.0) * trunc_log(1.0 - r)) - np.sum(r * trunc_log(r)))

    def pseudo_gradient(self, y, lp):
        return -y / (1.0 + trunc_exp(y * lp))

    def fit_null_model(self, y):
        pmin = 1e-9
        mu = np.clip(np.mean(0.5 * y + 0.5, axis=0), pmin, 1 - pmin)
        return trunc_log(mu / (1 - mu))

    def preprocess_response(self, y):
        y = np.asarray(y)
        if y.ndim > 1 and y.shape[1] > 1:
            raise ValueError("response for binomial regression must be one-dimensional")
        y = y.ravel()
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(f"binomial response needs exactly 2 classes, got {classes.size}")
        counts = [(y == c).sum() for c in classes]
        if min(counts) <= 1:
            raise ValueError("one class has <= 1 observation")
        # first class (sorted order, like R factor levels) -> -1, second -> +1
        enc = np.where(y == classes[0], -1.0, 1.0).reshape(-1, 1)
        return {
            "y": enc,
            "y_center": np.array([0.0]),
            "y_scale": np.array([1.0]),
            "n_classes": 2,
            "n_targets": 1,
            "class_names": [str(c) for c in classes],
        }


class Poisson(Family):
    name = "poisson"

    def primal(self, y, lp):
        # a diverged line-search candidate can push sum(trunc_exp(lp))
        # past float max; return an explicit +inf objective (rejected by
        # backtracking) instead of letting the overflow warn — converged
        # iterates never hit the clamp, so fitted numerics are unchanged
        with np.errstate(over="ignore"):
            val = np.sum(y * lp - trunc_exp(lp) - _lgamma(y + 1))
        return -float(val) if np.isfinite(val) else float(np.inf)

    def dual(self, y, lp):
        with np.errstate(over="ignore"):
            e = trunc_exp(lp)
            val = np.sum(e * (lp - 1) - _lgamma(y + 1))
        return -float(val) if np.isfinite(val) else float(np.inf)

    def pseudo_gradient(self, y, lp):
        return trunc_exp(lp) - y

    def fit_null_model(self, y):
        return trunc_log(np.mean(y, axis=0))

    def preprocess_response(self, y):
        y = np.asarray(y, dtype=np.float64)
        if y.ndim > 1 and y.shape[1] > 1:
            raise ValueError("response for poisson regression must be one-dimensional")
        y = y.reshape(-1, 1)
        if np.any(y < 0):
            raise ValueError("cannot have negative responses in poisson model")
        return {
            "y": y,
            "y_center": np.array([0.0]),
            "y_scale": np.array([1.0]),
            "n_classes": 1,
            "n_targets": 1,
            "class_names": None,
        }


class Multinomial(Family):
    name = "multinomial"

    @staticmethod
    def _lse(lp):
        """log(exp(-max) + sum_k exp(lp_k - max)) + max, rowwise — the
        implicit reference class contributes exp(0)."""
        lp_max = np.max(lp, axis=1, keepdims=True)
        return (trunc_log(np.exp(-lp_max) + np.sum(trunc_exp(lp - lp_max), axis=1, keepdims=True))
                + lp_max)

    def primal(self, y, lp):
        return float(np.sum(self._lse(lp))) - float(np.sum(y * lp))

    def dual(self, y, lp):
        lse = self._lse(lp)
        return float(np.sum(lse)) - float(np.sum(lp * trunc_exp(lp - lse)))

    def pseudo_gradient(self, y, lp):
        return trunc_exp(lp - self._lse(lp)) - y

    def fit_null_model(self, y):
        # implicit-reference parameterization (the model's lp has m =
        # n_classes - 1 columns with the reference logit fixed at 0):
        # the null optimum is b_k = log(mu_k / mu_ref)
        mu = np.mean(y, axis=0)
        return trunc_log(mu) - trunc_log(max(1.0 - float(np.sum(mu)), 1e-300))

    def preprocess_response(self, y):
        y = np.asarray(y).ravel()
        classes = np.unique(y)
        n_classes = int(classes.size)
        if n_classes == 2:
            raise ValueError("only two classes in response; use family='binomial'")
        if n_classes < 2:
            raise ValueError("only one class in response")
        counts = [(y == c).sum() for c in classes]
        if min(counts) <= 1:
            raise ValueError("one class has <= 1 observation")
        n_targets = n_classes - 1
        enc = np.zeros((y.size, n_targets))
        for k in range(n_targets):
            enc[:, k] = (y == classes[k]).astype(np.float64)
        return {
            "y": enc,
            "y_center": np.zeros(n_targets),
            "y_scale": np.ones(n_targets),
            "n_classes": n_classes,
            "n_targets": n_targets,
            "class_names": [str(c) for c in classes],
        }


FAMILIES = {
    "gaussian": Gaussian,
    "binomial": Binomial,
    "poisson": Poisson,
    "multinomial": Multinomial,
}


def get_family(name: str) -> Family:
    try:
        return FAMILIES[name]()
    except KeyError:
        raise ValueError(f"unknown family {name!r}; choose from {sorted(FAMILIES)}") from None


def lambda_max_gradient(family: Family, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """|X^T ytilde| flattened — the gradient at the null model used for
    sigma_max (reference src/lambdaMax.h:8-60). ``x`` EXCLUDES the
    intercept column; gaussian y must already be centered."""
    name = family.name
    if name == "binomial":
        y01 = (y + 1) / 2
        g = x.T @ (y01 - np.mean(y01))
    elif name == "multinomial":
        y_bar = np.mean(y, axis=0)
        y_std = np.std(y, axis=0)  # population sd, like arma stddev(y,1)
        y_map = (y - y_bar) / y_std
        g = (x.T @ y_map) * y_std
    elif name == "poisson":
        g = x.T @ (1 - y)
    else:
        g = x.T @ y
    return np.abs(np.asarray(g).ravel(order="F"))
