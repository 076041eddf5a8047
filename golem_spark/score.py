"""score()/deviance(): model evaluation along the path.

Reference parity: R/score.R:24-166, R/deviance.R:13-18.

Measures by family (same compatibility matrix as the reference):
- gaussian/poisson: mse, mae
- binomial: mse, mae, deviance (clamped log-loss ×2), misclass, auc
- multinomial: mse, mae, deviance, misclass

Spark mode computes every path point's score in ONE aggregation pass
(all path points' linear predictors are independent column expressions);
AUC uses the exact Mann-Whitney rank statistic via a window over the
predicted score with a deterministic key tie-break (kernel K12) instead
of the reference's randomized jitter (R/score.R:153).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from golem_spark.path import OwlFit
from golem_spark.predict import predict, coef_at

_CLAMP = 1e-15


def _measures_for(family: str) -> list[str]:
    return {
        "gaussian": ["mse", "mae"],
        "poisson": ["mse", "mae"],
        "binomial": ["mse", "mae", "deviance", "misclass", "auc"],
        "multinomial": ["mse", "mae", "deviance", "misclass"],
    }[family]


def score(fit: OwlFit, x=None, y=None, *, df: DataFrame | None = None,
          feature_cols: list[str] | None = None, label_col: str | None = None,
          sparse_features: tuple[str, str] | None = None,
          measure: str = "mse", sigma=None) -> np.ndarray:
    """Score the fit at every path point (or at ``sigma``); returns an
    array of scores, one per evaluated path point.

    ``sparse_features=(idx_col, val_col)``: score a sparse-features
    DataFrame — ONE Arrow pass evaluates every path point (the
    coefficient cube rides in the closure; a per-point literal
    expression list would not survive wide p)."""
    if measure not in _measures_for(fit.family):
        raise ValueError(f"measure {measure!r} not available for family {fit.family!r}")
    if df is not None and sparse_features is not None:
        return _score_sparse(fit, df, sparse_features, label_col, measure, sigma)
    if df is not None:
        return _score_spark(fit, df, feature_cols, label_col, measure, sigma)
    return _score_np(fit, np.asarray(x, dtype=np.float64), y, measure, sigma)


def deviance(fit: OwlFit) -> np.ndarray:
    """(1 - deviance_ratio) * null_deviance (R/deviance.R:13-18)."""
    return (1.0 - fit.deviance_ratio) * fit.null_deviance


# ---------------------------------------------------------------------------
# numpy scoring
# ---------------------------------------------------------------------------

def _score_np(fit: OwlFit, x: np.ndarray, y, measure: str, sigma) -> np.ndarray:
    fam = fit.family
    if sigma is not None:
        betas = coef_at(fit, sigma, simplify=False)
    else:
        betas = fit.coefficients
    K = betas.shape[2]
    out = np.zeros(K)

    if fam in ("gaussian", "poisson"):
        yv = np.asarray(y, dtype=np.float64)
        if yv.ndim == 1:
            yv = yv.reshape(-1, 1)
    elif fam == "binomial":
        y01 = np.asarray([0.0 if str(v) == str(fit.class_names[0]) else 1.0
                          for v in np.asarray(y).ravel()])
    else:
        names = fit.class_names
        y_idx = np.asarray([names.index(str(v)) for v in np.asarray(y).ravel()])
        n_classes = len(names)
        Y = np.zeros((y_idx.size, n_classes))
        Y[np.arange(y_idx.size), y_idx] = 1.0

    for k in range(K):
        sub = OwlFit(**{**fit.__dict__, "coefficients": betas[:, :, [k]]})
        if fam in ("gaussian", "poisson"):
            pred = predict(sub, x, type="response")  # (n, m)
            out[k] = _mse_mae(pred.ravel(), yv.ravel(), measure)
        elif fam == "binomial":
            prob = predict(sub, x, type="response")[:, 0]
            if measure in ("mse", "mae"):
                out[k] = _mse_mae(prob, y01, measure)
            elif measure == "deviance":
                p = np.clip(prob, _CLAMP, 1 - _CLAMP)
                out[k] = -2.0 * float(np.mean(y01 * np.log(p) + (1 - y01) * np.log(1 - p)))
            elif measure == "misclass":
                out[k] = float(np.mean((prob > 0.5) != (y01 == 1.0)))
            elif measure == "auc":
                out[k] = _auc_np(y01, prob)
        else:
            prob = predict(sub, x, type="response")  # (n, n_classes)
            if measure in ("mse", "mae"):
                out[k] = _mse_mae(prob.ravel(), Y.ravel(), measure)
            elif measure == "deviance":
                p = np.clip(prob, _CLAMP, 1 - _CLAMP)
                out[k] = -2.0 * float(np.sum(Y * np.log(p))) / Y.shape[0]
            elif measure == "misclass":
                out[k] = float(np.mean(np.argmax(prob, axis=1) != y_idx))
    return out


def _mse_mae(pred: np.ndarray, y: np.ndarray, measure: str) -> float:
    d = pred - y
    return float(np.mean(d * d)) if measure == "mse" else float(np.mean(np.abs(d)))


def _auc_np(y01: np.ndarray, prob: np.ndarray) -> float:
    """Mann-Whitney rank AUC with average ranks for ties
    (R/score.R:137-166, deterministic)."""
    order = np.argsort(prob, kind="stable")
    ranks = np.empty(prob.size, dtype=np.float64)
    sorted_p = prob[order]
    i = 0
    r = 1
    while i < prob.size:
        j = i
        while j + 1 < prob.size and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i:j + 1]] = avg
        r += j - i + 1
        i = j + 1
    n1 = float(np.sum(y01 == 1.0))
    n0 = float(np.sum(y01 == 0.0))
    if n1 == 0 or n0 == 0:
        return float("nan")
    u = float(np.sum(ranks[y01 == 1.0])) - n1 * (n1 + 1) / 2.0
    return u / (n1 * n0)


# ---------------------------------------------------------------------------
# Sparse Spark scoring (one Arrow pass, all path points)
# ---------------------------------------------------------------------------

def _score_sparse(fit: OwlFit, df: DataFrame, sparse_features, label_col,
                  measure: str, sigma) -> np.ndarray:
    import pandas as pd

    from golem_spark.backends import _collect_partials

    if measure == "auc":
        raise ValueError("auc over sparse features is not implemented; "
                         "use a dense scoring frame")
    fam = fit.family
    if sigma is not None:
        betas = coef_at(fit, sigma, simplify=False)
    else:
        betas = fit.coefficients
    p_tot, m, K = betas.shape
    B = np.ascontiguousarray(betas)
    intercept = fit.intercept
    idx_col, val_col = sparse_features
    class_names = fit.class_names
    label_cols = [label_col] if isinstance(label_col, str) else list(label_col)
    if fam == "gaussian" and m > 1 and len(label_cols) != m:
        raise ValueError(f"multi-target gaussian scoring needs {m} label "
                         f"columns, got {len(label_cols)}")

    def op(batches):
        from golem_spark.backends import _csr_batch

        for pdf in batches:
            nrow, lens, rows, fi, fv = _csr_batch(pdf, idx_col, val_col)
            lab = pdf[label_cols[0]].to_numpy()
            # lp: (nrow, m, K) — one O(nnz) bincount per (target, path
            # point), never an (nnz, m, K) temporary
            Bf = B[1:] if intercept else B
            lp = np.empty((nrow, m, K))
            for t in range(m):
                for k in range(K):
                    lp[:, t, k] = np.bincount(rows, weights=fv * Bf[fi, t, k],
                                              minlength=nrow)
            if intercept:
                lp += B[0][None, :, :]
            part = np.zeros(K + 1)
            part[K] = float(nrow)
            if fam in ("gaussian", "poisson"):
                Yt = pdf[label_cols].to_numpy(dtype=np.float64)  # (nrow, m)
                pred = np.exp(np.clip(lp, -700, 700)) if fam == "poisson" else lp
                d = pred - Yt[:, :, None]
                part[:K] = (np.sum(d * d, axis=(0, 1)) if measure == "mse"
                            else np.sum(np.abs(d), axis=(0, 1))) / m
            elif fam == "binomial":
                y01 = np.asarray([0.0 if str(v) == str(class_names[0]) else 1.0
                                  for v in lab])
                prob = 1.0 / (1.0 + np.exp(-np.clip(lp[:, 0, :], -700, 700)))
                if measure in ("mse", "mae"):
                    d = prob - y01[:, None]
                    part[:K] = (np.sum(d * d, axis=0) if measure == "mse"
                                else np.sum(np.abs(d), axis=0))
                elif measure == "deviance":
                    pcl = np.clip(prob, _CLAMP, 1 - _CLAMP)
                    part[:K] = -2.0 * np.sum(
                        y01[:, None] * np.log(pcl)
                        + (1 - y01[:, None]) * np.log(1 - pcl), axis=0)
                elif measure == "misclass":
                    part[:K] = np.sum((prob > 0.5) != (y01[:, None] == 1.0),
                                      axis=0)
            else:  # multinomial
                names = class_names
                y_idx = np.asarray([names.index(str(v)) for v in lab])
                full = np.concatenate(
                    [lp, np.zeros((nrow, 1, K))], axis=1)  # implicit class
                full -= full.max(axis=1, keepdims=True)
                e = np.exp(full)
                prob = e / e.sum(axis=1, keepdims=True)  # (nrow, m+1, K)
                Y = np.zeros((nrow, len(names)))
                Y[np.arange(nrow), y_idx] = 1.0
                if measure in ("mse", "mae"):
                    d = prob - Y[:, :, None]
                    s = (np.sum(d * d, axis=(0, 1)) if measure == "mse"
                         else np.sum(np.abs(d), axis=(0, 1)))
                    part[:K] = s / len(names)
                elif measure == "deviance":
                    pcl = np.clip(prob, _CLAMP, 1 - _CLAMP)
                    part[:K] = -2.0 * np.sum(Y[:, :, None] * np.log(pcl),
                                             axis=(0, 1))
                elif measure == "misclass":
                    part[:K] = np.sum(np.argmax(prob, axis=1)
                                      != y_idx[:, None], axis=0)
            yield pd.DataFrame({"part": [part]})

    out = _collect_partials(
        df.select(idx_col, val_col, *label_cols).mapInPandas(
            op, "part array<double>"), K + 1)
    n = max(out[K], 1.0)
    return out[:K] / n


# ---------------------------------------------------------------------------
# Spark scoring
# ---------------------------------------------------------------------------

def _score_spark(fit: OwlFit, df: DataFrame, feature_cols, label_col, measure, sigma) -> np.ndarray:
    fam = fit.family
    feature_cols = feature_cols or fit.feature_names
    if sigma is not None:
        betas = coef_at(fit, sigma, simplify=False)
    else:
        betas = fit.coefficients
    K = betas.shape[2]
    off = 1 if fit.intercept else 0
    y = F.col(label_col)

    if fam == "binomial":
        y01 = F.when(y == fit.class_names[0], 0.0).otherwise(1.0) \
            if fit.class_names else y.cast("double")
    if fam == "multinomial":
        names = fit.class_names

    def lp_expr(beta, t):
        expr = F.lit(float(beta[0, t])) if fit.intercept else F.lit(0.0)
        for j, c in enumerate(feature_cols):
            b = float(beta[j + off, t])
            if b != 0.0:
                expr = expr + F.lit(b) * F.col(c).cast("double")
        return expr

    if measure == "auc":
        # needs a window sort per path point; do them as separate jobs
        out = np.zeros(K)
        for k in range(K):
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp_expr(betas[:, :, k], 0)))
            scored = df.select(y01.alias("pos"), prob.alias("prob"))
            ranked = scored.withColumn(
                "r",
                (F.min(F.row_number().over(Window.orderBy("prob"))).over(
                    Window.partitionBy("prob"))
                 + F.max(F.row_number().over(Window.orderBy("prob"))).over(
                     Window.partitionBy("prob"))) / 2.0)
            agg = ranked.agg(
                F.sum(F.when(F.col("pos") == 1.0, F.col("r"))).alias("rsum"),
                F.sum(F.col("pos")).alias("n1"),
                F.count(F.lit(1)).alias("n")).collect()[0]
            n1 = float(agg["n1"])
            n0 = float(agg["n"]) - n1
            out[k] = (float(agg["rsum"]) - n1 * (n1 + 1) / 2.0) / (n1 * n0)
        return out

    aggs = []
    for k in range(K):
        beta = betas[:, :, k]
        if fam in ("gaussian", "poisson"):
            pred = lp_expr(beta, 0)
            if fam == "poisson":
                pred = F.exp(pred)
            d = pred - y.cast("double")
            aggs.append((F.avg(d * d) if measure == "mse" else F.avg(F.abs(d))).alias(f"s{k}"))
        elif fam == "binomial":
            prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp_expr(beta, 0)))
            if measure in ("mse", "mae"):
                d = prob - y01
                aggs.append((F.avg(d * d) if measure == "mse" else F.avg(F.abs(d))).alias(f"s{k}"))
            elif measure == "deviance":
                p = F.least(F.greatest(prob, F.lit(_CLAMP)), F.lit(1 - _CLAMP))
                ll = y01 * F.log(p) + (F.lit(1.0) - y01) * F.log(F.lit(1.0) - p)
                aggs.append((F.lit(-2.0) * F.avg(ll)).alias(f"s{k}"))
            elif measure == "misclass":
                wrong = (prob > 0.5) != (y01 == 1.0)
                aggs.append(F.avg(F.when(wrong, 1.0).otherwise(0.0)).alias(f"s{k}"))
        elif fam == "multinomial":
            m = betas.shape[1]
            lps = [lp_expr(beta, t) for t in range(m)]
            mx = F.greatest(*lps, F.lit(0.0)) if m > 1 else F.greatest(lps[0], F.lit(0.0))
            denom = F.exp(F.lit(0.0) - mx)
            for t in range(m):
                denom = denom + F.exp(lps[t] - mx)
            probs = [F.exp(lps[t] - mx) / denom for t in range(m)] + [F.exp(F.lit(0.0) - mx) / denom]
            inds = [F.when(y == names[t], 1.0).otherwise(0.0) for t in range(len(names))]
            if measure in ("mse", "mae"):
                terms = None
                for pr, ind in zip(probs, inds):
                    d = pr - ind
                    t_ = d * d if measure == "mse" else F.abs(d)
                    terms = t_ if terms is None else terms + t_
                aggs.append((F.avg(terms) / F.lit(float(len(names)))).alias(f"s{k}"))
            elif measure == "deviance":
                ll = None
                for pr, ind in zip(probs, inds):
                    p = F.least(F.greatest(pr, F.lit(_CLAMP)), F.lit(1 - _CLAMP))
                    t_ = ind * F.log(p)
                    ll = t_ if ll is None else ll + t_
                aggs.append((F.lit(-2.0) * F.avg(ll)).alias(f"s{k}"))
            elif measure == "misclass":
                arr = F.array(*probs)
                pred_idx = F.array_position(arr, F.array_max(arr)) - 1
                name_arr = F.array(*[F.lit(nm) for nm in names])
                wrong = F.element_at(name_arr, (pred_idx + 1).cast("int")) != y
                aggs.append(F.avg(F.when(wrong, 1.0).otherwise(0.0)).alias(f"s{k}"))
    row = df.agg(*aggs).collect()[0]
    return np.array([float(row[f"s{k}"]) for k in range(K)])
