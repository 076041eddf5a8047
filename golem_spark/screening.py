"""Predictor screening: strong rule, KKT checks, infeasibility.

These are the reference's work-avoidance optimizations — the SLOPE
analog of partition pruning: provably-inactive features are excluded
from the per-iteration compute, then a KKT pass re-admits any violators.
All inputs here are p-sized (already on the driver after the gradient
aggregation), so everything is plain numpy.

Reference parity: src/screening.h:7-53 (strong rule), src/kktCheck.h:8-37,
src/infeasibility.h:8-12, src/utils.h:27-46 (set bookkeeping).
"""

from __future__ import annotations

import math

import numpy as np

_SMALL = math.sqrt(np.finfo(np.float64).eps)


def infeasibility(gradient: np.ndarray, lam: np.ndarray) -> float:
    """max(cumsum(sort(|grad| desc) - lam), 0) — distance to dual
    feasibility of the sorted-L1 dual ball."""
    g = np.sort(np.abs(np.asarray(gradient).ravel()))[::-1]
    return max(float(np.max(np.cumsum(g - lam))), 0.0)


def strong_set(gradient_prev: np.ndarray, lam: np.ndarray, lam_prev: np.ndarray,
               intercept: bool) -> np.ndarray:
    """Sequential strong rule for SLOPE: the largest prefix k (over
    |grad| sorted descending) whose running sum of
    |grad|_(i) + lam_prev_i - 2*lam_i last touched zero from above.

    gradient_prev: (p_total, m) gradient at the previous path solution
    (including the intercept row when intercept=True — it is dropped
    here and re-added to the output, always active).
    Returns sorted feature-row indices into the full (p_total) space.
    """
    g = gradient_prev[1:, :] if intercept else gradient_prev
    p_rows, m = g.shape
    abs_g = np.abs(g.ravel(order="F"))
    p = abs_g.size
    ord_idx = np.argsort(-abs_g, kind="stable")
    tmp = abs_g[ord_idx] + lam_prev - 2.0 * lam

    i = 0
    k = 0
    s = 0.0
    while i + k < p:
        s += tmp[k + i]
        if s >= 0:
            k = k + i + 1
            i = 0
            s = 0.0
        else:
            i += 1

    mask = np.zeros(p, dtype=bool)
    mask[:k] = True
    unmask = np.zeros(p, dtype=bool)
    unmask[ord_idx] = mask
    row_active = unmask.reshape((p_rows, m), order="F").any(axis=1)
    out = np.flatnonzero(row_active)
    if intercept:
        out = np.concatenate(([0], out + 1))
    return out.astype(np.int64)


def kkt_check(gradient: np.ndarray, beta: np.ndarray, lam: np.ndarray,
              tol: float, intercept: bool) -> np.ndarray:
    """Features violating the sorted-L1 KKT conditions: the sorted-cumsum
    test cumsum(|grad|_sorted - lam) > max(sqrt(eps), tol*lam[0]),
    excluding rows with nonzero beta. Returns row indices into the full
    (p_total) space."""
    g = gradient[1:, :] if intercept else gradient
    b = beta[1:, :] if intercept else beta
    p_rows, m = g.shape
    gv = g.ravel(order="F")
    bv = b.ravel(order="F")

    ord_idx = np.argsort(-np.abs(gv), kind="stable")
    abs_sorted = np.abs(gv[ord_idx])
    rh = max(_SMALL, tol * float(lam[0]))
    flag_sorted = np.cumsum(abs_sorted - lam) > rh
    flags = np.zeros(gv.size, dtype=bool)
    flags[ord_idx] = flag_sorted
    flags[bv != 0] = False

    row_viol = flags.reshape((p_rows, m), order="F").any(axis=1)
    out = np.flatnonzero(row_viol)
    if intercept:
        out = out + 1
    return out.astype(np.int64)


def set_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def set_diff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.setdiff1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def set_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.intersect1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))
