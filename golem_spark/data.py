"""Deterministic fixture generators for the reference's five bundled
datasets (FIXTURES.md A1-A5; reference R/data.R:1-192) and the
randomProblem generator (R/utils.R:15-76, reimplemented in
tests/conftest.py::random_problem).

Same shapes/types/roles as the reference data, seed-pinned values (the
reference .rda payloads are not copied)."""

from __future__ import annotations

import numpy as np


def bodyfat(seed: int = 42):
    """252x13 gaussian: percent body fat from body measurements, with
    correlated circumference features (A1)."""
    rng = np.random.default_rng(seed)
    n = 252
    age = rng.uniform(20, 80, n)
    height = rng.normal(70, 3, n)
    frame = rng.normal(0, 1, n)  # latent size factor -> correlated features
    weight = 170 + 40 * frame + rng.normal(0, 10, n)
    circ = {}
    for name, base, coef in [("neck", 38, 2.5), ("chest", 100, 8), ("abdomen", 92, 10),
                             ("hip", 100, 7), ("thigh", 59, 5), ("knee", 38, 2.5),
                             ("ankle", 23, 1.5), ("biceps", 32, 3), ("forearm", 28, 2),
                             ("wrist", 18, 0.9)]:
        circ[name] = base + coef * frame + rng.normal(0, base * 0.03, n)
    x = np.column_stack([age, weight, height] + list(circ.values()))
    names = ["age", "weight", "height", *circ.keys()]
    y = np.clip(2 + 0.05 * age + 0.45 * circ["abdomen"] - 0.35 * height
                + rng.normal(0, 4, n), 0, 50)
    return x, y, names


def abalone(seed: int = 43):
    """211x9 poisson: ring counts from physical measurements (A2)."""
    rng = np.random.default_rng(seed)
    n = 211
    size = rng.uniform(0.2, 0.8, n)
    sex = rng.integers(0, 2, n).astype(float)
    infant = ((1 - sex) * (size < 0.4)).astype(float)
    length = size * 200 + rng.normal(0, 5, n)
    diameter = size * 160 + rng.normal(0, 4, n)
    height = size * 50 + rng.normal(0, 2, n)
    w_whole = (size ** 3) * 8 + rng.normal(0, 0.1, n)
    w_shucked = w_whole * 0.45 + rng.normal(0, 0.05, n)
    w_viscera = w_whole * 0.22 + rng.normal(0, 0.03, n)
    w_shell = w_whole * 0.28 + rng.normal(0, 0.03, n)
    x = np.column_stack([sex, infant, length, diameter, height,
                         w_whole, w_shucked, w_viscera, w_shell])
    names = ["sex", "infant", "length", "diameter", "height",
             "weight_whole", "weight_shucked", "weight_viscera", "weight_shell"]
    lam = np.exp(1.2 + 1.5 * size)
    y = rng.poisson(lam).astype(float) + 1
    return x, y, names


def heart(seed: int = 44):
    """270x17 binomial with mostly-zero dummy columns (sparse path, A3)."""
    rng = np.random.default_rng(seed)
    n = 270
    cont = np.column_stack([
        rng.uniform(29, 77, n), rng.uniform(94, 200, n), rng.uniform(126, 564, n),
        rng.uniform(71, 202, n), rng.uniform(0, 6.2, n), rng.integers(0, 4, n).astype(float)])
    dummies = (rng.random((n, 11)) < rng.uniform(0.05, 0.4, 11)).astype(float)
    x = np.column_stack([cont, dummies])
    names = ["age", "bp", "chol", "hr", "old_peak", "vessels",
             "sex", "angina", "glucose_high", "cp_typical", "cp_atypical",
             "cp_nonanginal", "ecg_abnormal", "ecg_estes", "slope_flat",
             "slope_downsloping", "thal_reversible"]
    lp = 0.03 * (cont[:, 0] - 50) + 1.2 * dummies[:, 1] - 0.01 * (cont[:, 3] - 140)
    y = np.where(lp + rng.normal(0, 1, n) > 0, "presence", "absence")
    return x, y, names


def wine(seed: int = 45):
    """178x13 multinomial, 3 classes; proline ~100x larger scale (A4)."""
    rng = np.random.default_rng(seed)
    n = 178
    cls = rng.integers(0, 3, n)
    mu = np.array([[13.7, 2.0, 2.45], [12.3, 1.9, 2.25], [13.1, 3.3, 2.44]])
    feats = []
    for j in range(13):
        base = mu[cls, j % 3] if j < 3 else 1.5 + cls * 0.5
        scale = 0.3 if j != 12 else 300
        center = base if j != 12 else 400 + 300 * (2 - cls)
        feats.append(center + rng.normal(0, scale, n))
    x = np.column_stack(feats)
    names = ["alcohol", "malic", "ash", "alcalinity", "magnesium", "phenols",
             "flavanoids", "nonflavanoids", "proanthocyanins", "color", "hue",
             "dilution", "proline"]
    y = np.array(["A", "B", "C"])[cls]
    return x, y, names


def student(seed: int = 46):
    """382x21 multi-target gaussian: two grade targets (A5)."""
    rng = np.random.default_rng(seed)
    n = 382
    binaries = (rng.random((n, 18)) < 0.5).astype(float)
    medu = rng.integers(0, 5, n).astype(float)
    fedu = rng.integers(0, 5, n).astype(float)
    age = rng.integers(15, 23, n).astype(float)
    x = np.column_stack([binaries, medu, fedu, age])
    names = [f"bin{j}" for j in range(18)] + ["Medu", "Fedu", "age"]
    ability = 0.8 * medu + 0.5 * fedu - 0.3 * binaries[:, 0] + rng.normal(0, 2, n)
    math = np.clip(np.round(10 + ability + rng.normal(0, 2, n)), 0, 20)
    port = np.clip(np.round(11 + 0.9 * ability + rng.normal(0, 2, n)), 0, 20)
    return x, np.column_stack([math, port]), names


def random_problem(n=100, p=10, q=0.3, n_targets=1, density=1.0,
                   amplitude=3.0, sigma_noise=1.0, response="gaussian",
                   rho=0.0, seed=42):
    """Deterministic reimplementation of the reference's randomProblem
    generator (R/utils.R:15-76): N(0,1) features (optionally sparse /
    equicorrelated via shared noise), planted signed signals of given
    amplitude at rate q, family-specific response links."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, p))
    if density < 1.0:
        mask = rng.random((n, p)) < density
        x = x * mask
    if rho > 0:
        z = rng.standard_normal((n, 1))
        x = x + np.sqrt(rho / (1 - rho)) * z

    m = n_targets
    k = max(1, int(q * p * m))
    beta = np.zeros(p * m)
    idx = rng.choice(p * m, size=k, replace=False)
    beta[idx] = amplitude * rng.choice([-1.0, 1.0], size=k)
    beta = beta.reshape(p, m)

    lp = x @ beta
    if response == "gaussian":
        # n_targets > 1 yields an (n, m) multi-task response
        y = lp + sigma_noise * rng.standard_normal((n, m))
        if m == 1:
            y = y[:, 0]
    elif response == "binomial":
        y = (np.sign(lp[:, 0] + sigma_noise * rng.standard_normal(n)) + 1) / 2
    elif response == "poisson":
        y = rng.poisson(np.exp(np.clip(lp[:, 0], -20, 20)))
    elif response == "multinomial":
        full = np.hstack([lp, np.zeros((n, 1))])
        pr = np.exp(full - full.max(axis=1, keepdims=True))
        pr /= pr.sum(axis=1, keepdims=True)
        y = np.array([rng.choice(m + 1, p=pr[i]) for i in range(n)])
    else:
        raise ValueError(response)
    return x, y, beta


FIXTURES = {
    "bodyfat": (bodyfat, "gaussian"),
    "abalone": (abalone, "poisson"),
    "heart": (heart, "binomial"),
    "wine": (wine, "multinomial"),
    "student": (student, "gaussian"),  # multi-target
}
