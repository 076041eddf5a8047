"""coef()/predict(): path interpolation, link functions, class decisions.

Reference parity: R/coef.R:23-54, R/interpolatePenalty.R:10-37,
R/interpolateCoefficients.R:9-27, R/predict.R:32-197.

predict() works on numpy arrays or Spark DataFrames. The Spark path
computes every requested path point's linear predictor in ONE select with
beta entering as literals (broadcast-equivalent: the plan ships the
p-sized constants, never the data), then applies the family link as
column expressions — sigmoid/exp in whole-stage codegen, softmax/argmax
via array expressions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from golem_spark.path import OwlFit


# ---------------------------------------------------------------------------
# Coefficient interpolation along the path
# ---------------------------------------------------------------------------

def _interpolation_weights(path_sigma: np.ndarray, want: np.ndarray):
    """glmnet-style lambda.interp (R/interpolatePenalty.R:10-37): for each
    requested sigma, the two adjacent path indices and the blend fraction."""
    s = np.asarray(path_sigma, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    if s.size == 1:
        left = np.zeros(want.size, dtype=int)
        right = np.zeros(want.size, dtype=int)
        frac = np.ones(want.size)
        return left, right, frac
    smax, smin = float(s.max()), float(s.min())
    want_c = np.clip(want, smin, smax)
    # interpolate on the normalized scale like the reference
    sfrac = (smax - want_c) / (smax - smin)
    k = (smax - s) / (smax - smin)
    idx = np.interp(sfrac, k, np.arange(s.size))
    left = np.floor(idx).astype(int)
    right = np.ceil(idx).astype(int)
    denom = k[right] - k[left]
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(denom != 0, (sfrac - k[left]) / denom, 1.0)
    # frac is the weight on the RIGHT point
    return left, right, 1.0 - frac


def coef_at(fit: OwlFit, sigma=None, simplify: bool = True, *,
            exact: bool = False, x=None, y=None,
            df=None, feature_cols=None, label_col=None,
            sparse_features=None, sparse_p=None) -> np.ndarray:
    """Coefficients at the requested sigma value(s) (R/coef.R:23-54).

    Off-path sigmas are linearly interpolated between adjacent path
    points by default; with ``exact=True`` the model is REFIT at the
    requested sigmas (the reference's ``stats::update`` path,
    R/coef.R:40-42) — the caller must re-supply the training data
    (numpy ``x, y`` or Spark ``df/feature_cols/label_col``), exactly
    like the reference requires ``x`` and ``y`` in the dots."""
    if sigma is None:
        out = fit.coefficients
        return out[:, :, 0] if (simplify and out.shape[2] == 1) else out
    want = np.atleast_1d(np.asarray(sigma, dtype=np.float64))

    on_path = np.all([np.any(np.isclose(w, fit.sigma, rtol=1e-12)) for w in want])
    if exact and not on_path:
        if x is None and df is None:
            raise ValueError(
                "coef_at(..., exact=True) refits the model: pass the training "
                "data (x, y) or (df, feature_cols, label_col)")
        from golem_spark.path import owl

        opts = dict(fit.meta.get("fit_options", {}))
        opts.setdefault("family", fit.family)
        opts.setdefault("intercept", fit.intercept)
        refit = owl(x, y, df=df, feature_cols=feature_cols,
                    label_col=label_col, sparse_features=sparse_features,
                    sparse_p=sparse_p, sigma=want, **opts)
        out = refit.coefficients
        return out[:, :, 0] if (simplify and out.shape[2] == 1) else out

    left, right, wl = _interpolation_weights(fit.sigma, want)
    out = (fit.coefficients[:, :, left] * wl[None, None, :]
           + fit.coefficients[:, :, right] * (1.0 - wl)[None, None, :])
    return out[:, :, 0] if (simplify and out.shape[2] == 1) else out


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------

def _linear_predictor_np(x: np.ndarray, beta: np.ndarray, intercept: bool) -> np.ndarray:
    if intercept:
        return beta[0, :][None, :] + x @ beta[1:, :]
    return x @ beta


def predict(fit: OwlFit, x=None, *, df: DataFrame | None = None,
            feature_cols: list[str] | None = None,
            sparse_features: tuple[str, str] | None = None, sigma=None,
            type: str = "link", path_idx: int | None = None):
    """Predict from a fitted path.

    type: 'link' (linear predictor), 'response' (family inverse link),
    'class' (binomial/multinomial decision).

    numpy mode returns an ndarray (n, m) for a single sigma or (n, m, K);
    Spark mode (df=...) returns the DataFrame with appended prediction
    columns pred_0..pred_{m-1} / pred_class for ONE path point (pass
    sigma or path_idx). ``sparse_features=(idx_col, val_col)`` predicts
    over sparse rows via one Arrow map pass (no literal expression per
    feature — survives wide p).
    """
    if df is not None and sparse_features is not None:
        return _predict_sparse(fit, df, sparse_features, sigma, type, path_idx)
    if df is not None:
        return _predict_spark(fit, df, feature_cols, sigma, type, path_idx)

    x = np.asarray(x, dtype=np.float64)
    if sigma is not None:
        betas = coef_at(fit, sigma, simplify=False)
    elif path_idx is not None:
        betas = fit.coefficients[:, :, [path_idx]]
    else:
        betas = fit.coefficients
    K = betas.shape[2]
    outs = []
    for k in range(K):
        lp = _linear_predictor_np(x, betas[:, :, k], fit.intercept)
        outs.append(_apply_link_np(fit, lp, type))
    out = np.stack(outs, axis=-1)
    return out[..., 0] if K == 1 else out


def _apply_link_np(fit: OwlFit, lp: np.ndarray, type: str):
    fam = fit.family
    if type == "link":
        return lp
    if type == "response":
        if fam == "gaussian":
            return lp
        if fam == "binomial":
            return 1.0 / (1.0 + np.exp(-lp))
        if fam == "poisson":
            return np.exp(lp)
        if fam == "multinomial":
            full = np.hstack([lp, np.zeros((lp.shape[0], 1))])
            full -= full.max(axis=1, keepdims=True)
            e = np.exp(full)
            return e / e.sum(axis=1, keepdims=True)
        raise ValueError(fam)
    if type == "class":
        names = fit.class_names
        if fam == "binomial":
            idx = (lp[:, 0] > 0).astype(int)
            return np.asarray([names[i] for i in idx])
        if fam == "multinomial":
            full = np.hstack([lp, np.zeros((lp.shape[0], 1))])
            return np.asarray([names[i] for i in np.argmax(full, axis=1)])
        raise ValueError(f"type='class' not defined for family {fam!r}")
    raise ValueError(f"unknown type {type!r}")


def _predict_sparse(fit: OwlFit, df: DataFrame, sparse_features, sigma,
                    type, path_idx):
    """Arrow map pass appending pred_* columns for ONE path point from
    (indices, values) rows — the coefficient vector rides in the
    closure as a CSR matvec, never as per-feature literals."""
    import pandas as pd

    if sigma is not None:
        beta = coef_at(fit, float(np.atleast_1d(sigma)[0]), simplify=False)[:, :, 0]
    else:
        beta = fit.coefficients[:, :, path_idx if path_idx is not None else fit.n_sigma - 1]
    B = np.ascontiguousarray(beta)
    m = B.shape[1]
    intercept = fit.intercept
    fam = fit.family
    names = fit.class_names
    idx_col, val_col = sparse_features

    if type == "class" and fam not in ("binomial", "multinomial"):
        raise ValueError(f"type='class' not defined for family {fam!r}")
    if type not in ("link", "response", "class"):
        raise ValueError(f"unknown type {type!r}")

    if type == "class":
        out_fields = "pred_class string"
    elif type == "response" and fam == "multinomial":
        out_fields = ", ".join(f"pred_{t} double" for t in range(m + 1))
    else:
        out_fields = ", ".join(f"pred_{t} double" for t in range(m))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", " + out_fields

    def op(batches):
        from golem_spark.backends import _csr_batch

        for pdf in batches:
            nrow, lens, rows, fi, fv = _csr_batch(pdf, idx_col, val_col)
            Bf = B[1:] if intercept else B
            lp = np.zeros((nrow, m))
            for t in range(m):
                lp[:, t] = np.bincount(rows, weights=fv * Bf[fi, t],
                                       minlength=nrow)
            if intercept:
                lp += B[0][None, :]
            out = pdf.copy()
            if type == "link" or (type == "response" and fam == "gaussian"):
                for t in range(m):
                    out[f"pred_{t}"] = lp[:, t]
            elif type == "response" and fam == "binomial":
                out["pred_0"] = 1.0 / (1.0 + np.exp(-np.clip(lp[:, 0], -700, 700)))
            elif type == "response" and fam == "poisson":
                out["pred_0"] = np.exp(np.clip(lp[:, 0], -700, 700))
            elif type == "response":  # multinomial
                full = np.hstack([lp, np.zeros((nrow, 1))])
                full -= full.max(axis=1, keepdims=True)
                e = np.exp(full)
                probs = e / e.sum(axis=1, keepdims=True)
                for t in range(m + 1):
                    out[f"pred_{t}"] = probs[:, t]
            elif fam == "binomial":  # class
                out["pred_class"] = np.where(lp[:, 0] > 0, names[1], names[0])
            else:  # multinomial class
                full = np.hstack([lp, np.zeros((nrow, 1))])
                out["pred_class"] = [names[i] for i in np.argmax(full, axis=1)]
            yield out

    return df.mapInPandas(op, schema)


def _predict_spark(fit: OwlFit, df: DataFrame, feature_cols, sigma, type, path_idx):
    feature_cols = feature_cols or fit.feature_names
    if sigma is not None:
        beta = coef_at(fit, float(np.atleast_1d(sigma)[0]), simplify=False)[:, :, 0]
    else:
        beta = fit.coefficients[:, :, path_idx if path_idx is not None else fit.n_sigma - 1]
    m = beta.shape[1]
    off = 1 if fit.intercept else 0
    lps = []
    for t in range(m):
        expr = F.lit(float(beta[0, t])) if fit.intercept else F.lit(0.0)
        for j, c in enumerate(feature_cols):
            b = float(beta[j + off, t])
            if b != 0.0:
                expr = expr + F.lit(b) * F.col(c).cast("double")
        lps.append(expr)

    fam = fit.family
    if type == "link":
        out = df
        for t in range(m):
            out = out.withColumn(f"pred_{t}", lps[t])
        return out
    if type == "response":
        out = df
        if fam == "gaussian":
            for t in range(m):
                out = out.withColumn(f"pred_{t}", lps[t])
        elif fam == "binomial":
            out = out.withColumn("pred_0", F.lit(1.0) / (F.lit(1.0) + F.exp(-lps[0])))
        elif fam == "poisson":
            out = out.withColumn("pred_0", F.exp(lps[0]))
        elif fam == "multinomial":
            mx = F.greatest(*lps, F.lit(0.0)) if m > 1 else F.greatest(lps[0], F.lit(0.0))
            denom = F.exp(F.lit(0.0) - mx)
            for t in range(m):
                denom = denom + F.exp(lps[t] - mx)
            for t in range(m):
                out = out.withColumn(f"pred_{t}", F.exp(lps[t] - mx) / denom)
            out = out.withColumn(f"pred_{m}", F.exp(F.lit(0.0) - mx) / denom)
        return out
    if type == "class":
        names = fit.class_names
        if fam == "binomial":
            return df.withColumn(
                "pred_class",
                F.when(lps[0] > 0, F.lit(names[1])).otherwise(F.lit(names[0])))
        if fam == "multinomial":
            arr = F.array(*lps, F.lit(0.0))
            idx = F.array_position(arr, F.array_max(arr)) - 1
            name_arr = F.array(*[F.lit(nm) for nm in names])
            return df.withColumn("pred_class", F.element_at(name_arr, (idx + 1).cast("int")))
        raise ValueError(f"type='class' not defined for family {fam!r}")
    raise ValueError(f"unknown type {type!r}")
