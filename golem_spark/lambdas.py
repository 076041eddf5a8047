"""Regularization-path machinery: lambda sequences and the sigma grid.

All of this is driver-side numpy — inputs and outputs are model-sized
(length m*p), never data-sized. Reference parity:
/root/reference/src/regularizationPath.h:8-76 and src/lambdaMax.h.

The only distributed piece is ``lambda_max`` (the gradient at the null
model), implemented in backends as one X^T ytilde mat-vec.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Inverse normal CDF. scipy is unavailable in this environment, so we use
# Acklam's rational approximation (public domain, widely published) plus one
# Halley refinement step with math.erfc, giving ~1e-15 relative accuracy.
# ---------------------------------------------------------------------------

_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)


def _norm_ppf_scalar(p: float) -> float:
    if p <= 0.0:
        return -math.inf
    if p >= 1.0:
        return math.inf
    p_low = 0.02425
    if p < p_low:
        q = math.sqrt(-2.0 * math.log(p))
        x = ((((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5])
             / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1.0))
    elif p <= 1.0 - p_low:
        q = p - 0.5
        r = q * q
        x = ((((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5]) * q
             / (((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1.0))
    else:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        x = -((((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5])
              / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1.0))
    # One Halley refinement using the exact CDF via erfc.
    e = 0.5 * math.erfc(-x / math.sqrt(2.0)) - p
    u = e * math.sqrt(2.0 * math.pi) * math.exp(x * x / 2.0)
    x = x - u / (1.0 + x * u / 2.0)
    return x


def norm_ppf(p) -> np.ndarray:
    """Vectorized standard-normal quantile function."""
    arr = np.asarray(p, dtype=np.float64)
    out = np.array([_norm_ppf_scalar(float(v)) for v in arr.ravel()])
    return out.reshape(arr.shape)


# ---------------------------------------------------------------------------
# Lambda sequences (reference: src/regularizationPath.h:28-55).
# All sequences are length m*p, non-increasing, non-negative.
# ---------------------------------------------------------------------------

def lambda_sequence(kind: str, n: int, mp: int, q: float = 0.2,
                    user_lambda: np.ndarray | None = None) -> np.ndarray:
    """Build the SLOPE lambda sequence.

    kind: 'bh' (Benjamini-Hochberg), 'gaussian' (BH with cumulative
    correction), 'oscar' (linear decreasing), or 'user'.
    Returned sequence is NOT scaled by n (the path code applies the x n /
    divide-by-n convention the reference uses, src/owl.cpp:380).
    """
    if kind == "user":
        lam = np.asarray(user_lambda, dtype=np.float64).ravel()
        if lam.size != mp:
            raise ValueError(f"user lambda length {lam.size} != m*p = {mp}")
        if np.any(lam < 0):
            raise ValueError("lambda must be non-negative")
        if np.any(np.diff(lam) > 0):
            raise ValueError("lambda must be non-increasing")
        return lam.copy()

    i = np.arange(1, mp + 1, dtype=np.float64)
    if kind == "bh":
        return norm_ppf(1.0 - i * q / (2.0 * mp))
    if kind == "gaussian":
        lam = norm_ppf(1.0 - i * q / (2.0 * mp))
        if mp > 1:
            # adjust by sqrt(1 + cumsum(lam^2)/w) with w = n - i - 1 (>=1),
            # then monotonize: after the minimum, hold the minimum.
            adj = lam.copy()
            csum = 0.0
            for k in range(1, mp):
                prev = float(adj[k - 1])
                if prev > 1e150 or csum > 1e290:
                    # the adjustment diverges when mp >> n (csum/w
                    # compounds); past ~1e150 the sequence can never
                    # return below its running minimum (lam ratios are
                    # bounded), so stop before prev**2 overflows — the
                    # +inf tail is erased by the monotonize step below
                    adj[k:] = np.inf
                    break
                csum += prev * prev
                w = max(n - k - 1.0, 1.0)
                adj[k] = lam[k] * math.sqrt(1.0 + csum / w)
            kmin = int(np.argmin(adj))
            adj[kmin:] = adj[kmin]
            assert np.isfinite(adj[kmin]), "gaussian lambda adjustment " \
                "produced a non-finite minimum"
            lam = adj
        return lam
    if kind == "oscar":
        return q * (mp - i) + 1.0
    raise ValueError(f"unknown lambda kind: {kind!r}")


def sigma_grid(lambda_max_grad: np.ndarray, lam: np.ndarray, n_sigma: int,
               lambda_min_ratio: float) -> tuple[float, np.ndarray]:
    """sigma_max and the geometric sigma grid.

    sigma_max is the smallest penalty multiplier for which beta = 0 is
    optimal: max over prefixes k of cumsum(sort(|grad|, desc))_k /
    cumsum(lam)_k (reference: src/regularizationPath.h:64-71).
    """
    g = np.sort(np.abs(np.asarray(lambda_max_grad, dtype=np.float64).ravel()))[::-1]
    cl = np.cumsum(np.asarray(lam, dtype=np.float64).ravel())
    with np.errstate(divide="ignore", invalid="ignore"):
        ratios = np.where(cl > 0, np.cumsum(g) / cl, 0.0)
    sigma_max = float(np.max(ratios))
    if sigma_max <= 0:
        sigma_max = 1.0
    grid = np.geomspace(sigma_max, sigma_max * lambda_min_ratio, n_sigma)
    return sigma_max, grid
