"""Diagnostics + display surface (reference O31, O44-O47).

Plots require matplotlib, which this container lacks — the plotting
functions build the exact data the reference plots
(R/plot.R, R/plotDiagnostics.R) and render only when matplotlib
imports; otherwise they return the prepared data.
"""

from __future__ import annotations

import numpy as np

from golem_spark.path import OwlFit

try:  # pragma: no cover - matplotlib not in this container
    import matplotlib.pyplot as plt

    HAS_MPL = True
except ImportError:
    plt = None
    HAS_MPL = False


def diagnostics_frame(fit: OwlFit):
    """Long-form (path_idx, iteration, time, primal, dual) rows
    (reference R/setupDiagnostics.R:9-25); requires owl(...,
    diagnostics=True)."""
    if fit.diagnostics is None:
        raise ValueError("fit without diagnostics=True has no diagnostics")
    return list(fit.diagnostics)


def path_plot_data(fit: OwlFit, target: int = 0):
    """Coefficient paths vs sigma, nonzero-only (plot.Owl,
    R/plot.R:19-109)."""
    start = 1 if fit.intercept else 0
    coefs = fit.coefficients[start:, target, :]
    nz = np.abs(coefs).max(axis=1) > 0
    return {
        "sigma": fit.sigma.tolist(),
        "features": [f for f, keep in zip(fit.feature_names, nz) if keep],
        "paths": coefs[nz].tolist(),
    }


def plot_path(fit: OwlFit, target: int = 0, ax=None):
    data = path_plot_data(fit, target)
    if not HAS_MPL:
        return data
    ax = ax or plt.gca()
    for name, path in zip(data["features"], data["paths"]):
        ax.plot(data["sigma"], path, label=name)
    ax.set_xscale("log")
    ax.invert_xaxis()
    ax.set_xlabel("sigma")
    ax.set_ylabel("coefficient")
    ax.legend(fontsize=7)
    return ax


def diagnostics_plot_data(fit: OwlFit, ind: int | None = None,
                          xvar: str = "time"):
    """Primal/dual objective curves for ONE path point — the data behind
    plotDiagnostics (R/plotDiagnostics.R:22-73): subset the diagnostics
    to penalty index ``ind`` (default the LAST collected path point,
    matching the reference's ``max(object$diagnostics$penalty)``), x =
    wall-clock ``time`` (the reference default) or ``iteration``."""
    if xvar not in ("time", "iteration"):
        raise ValueError("xvar must be 'time' or 'iteration'")
    rows = diagnostics_frame(fit)  # raises without diagnostics=True
    if ind is None:
        ind = max(r[0] for r in rows)
    sel = [r for r in rows if r[0] == ind]
    if not sel:
        raise ValueError(f"no diagnostics collected at path index {ind}")
    return {
        "ind": ind,
        "xvar": xvar,
        "x": [r[1] if xvar == "iteration" else r[2] for r in sel],
        "primal": [r[3] for r in sel],
        "dual": [r[4] for r in sel],
    }


def plot_diagnostics(fit: OwlFit, ind: int | None = None,
                     xvar: str = "time", ax=None):
    """plotDiagnostics parity (O46): primal + dual objective vs
    iteration/time for one path point; returns the prepared data when
    matplotlib is unavailable (same contract as plot_path/plot_cv)."""
    data = diagnostics_plot_data(fit, ind=ind, xvar=xvar)
    if not HAS_MPL:
        return data
    ax = ax or plt.gca()
    ax.plot(data["x"], data["primal"], label="primal")
    ax.plot(data["x"], data["dual"], label="dual")
    ax.set_xlabel("Time (seconds)" if xvar == "time" else "Iteration")
    ax.set_ylabel("Objective")
    ax.legend(fontsize=7)
    return ax


def cv_plot_data(trained):
    """mean +/- CI vs sigma per (measure, q) (plot.TrainedOwl,
    R/plot.R:144-299)."""
    out = {}
    for row in trained.summary:
        key = (row["measure"], row["q"])
        out.setdefault(key, {"sigma": [], "mean": [], "lo": [], "hi": []})
        for k in ("sigma", "mean", "lo", "hi"):
            out[(row["measure"], row["q"])][k].append(row[k])
    return out


def plot_cv(trained, measure=None, ax=None):
    data = cv_plot_data(trained)
    if not HAS_MPL:
        return data
    ax = ax or plt.gca()
    for (m, qv), d in data.items():
        if measure and m != measure:
            continue
        ax.plot(d["sigma"], d["mean"], label=f"{m} q={qv}")
        ax.fill_between(d["sigma"], d["lo"], d["hi"], alpha=0.2)
    ax.set_xscale("log")
    ax.invert_xaxis()
    ax.legend(fontsize=7)
    return ax


def print_path(fit: OwlFit) -> str:
    """Path summary table (print.Owl, R/print.R:14-43)."""
    lines = [f"family: {fit.family}  intercept: {fit.intercept}  "
             f"p: {len(fit.feature_names)}  path: {fit.n_sigma}",
             f"{'idx':>4} {'sigma':>12} {'dev_ratio':>10} {'n_nonzero':>10} {'n_unique':>9}"]
    start = 1 if fit.intercept else 0
    for k in range(fit.n_sigma):
        nnz = int((np.abs(fit.coefficients[start:, :, k]) > 0).any(axis=1).sum())
        lines.append(f"{k:>4} {fit.sigma[k]:>12.4e} {fit.deviance_ratio[k]:>10.4f} "
                     f"{nnz:>10} {int(fit.n_unique[k]):>9}")
    return "\n".join(lines)
