"""pyspark.ml Estimator/Model adapter for SLOPE (reference O43: the
caret adapter R/caretOwl.R:15-269, re-expressed for Spark ML Pipelines).

``SlopeEstimator`` composes with Pipeline/ParamGridBuilder/
CrossValidator: Params (family, sigma, q, ...) are real ml Params, fit()
returns a ``SlopeModel`` whose transform() appends prediction columns.
The path-reuse trick the caret adapter implements via submodels is
native here: the fitted model holds the WHOLE path and predicts at any
sigma via interpolation (predict.py) without refitting.
"""

from __future__ import annotations

import numpy as np
from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasFeaturesCol, HasLabelCol, HasPredictionCol

from golem_spark.path import owl
from golem_spark.predict import predict as _predict


class _SlopeParams(HasLabelCol, HasPredictionCol):
    family = Param(Params._dummy(), "family", "GLM family",
                   typeConverter=TypeConverters.toString)
    q = Param(Params._dummy(), "q", "FDR level for the BH lambda sequence",
              typeConverter=TypeConverters.toFloat)
    sigma = Param(Params._dummy(), "sigma", "penalty multiplier (<=0: auto path)",
                  typeConverter=TypeConverters.toFloat)
    nSigma = Param(Params._dummy(), "nSigma", "path length for auto sigma",
                   typeConverter=TypeConverters.toInt)
    featureCols = Param(Params._dummy(), "featureCols", "feature column names",
                        typeConverter=TypeConverters.toListString)
    fitIntercept = Param(Params._dummy(), "fitIntercept", "fit an intercept",
                         typeConverter=TypeConverters.toBoolean)
    tolAbs = Param(Params._dummy(), "tolAbs",
                   "absolute solver tolerance (<=0: owl() default)",
                   typeConverter=TypeConverters.toFloat)
    tolRel = Param(Params._dummy(), "tolRel",
                   "relative solver tolerance (<=0: owl() default)",
                   typeConverter=TypeConverters.toFloat)

    def getFamily(self):
        return self.getOrDefault(self.family)

    def getFeatureCols(self):
        return self.getOrDefault(self.featureCols)


class SlopeEstimator(Estimator, _SlopeParams):
    """ml-Pipeline-compatible SLOPE GLM estimator over plain numeric
    feature columns (no VectorAssembler needed — columns stay prunable).
    """

    @keyword_only
    def __init__(self, *, featureCols=None, labelCol="label", family="gaussian",
                 q=0.2, sigma=-1.0, nSigma=50, fitIntercept=True,
                 predictionCol="prediction", tolAbs=-1.0, tolRel=-1.0):
        super().__init__()
        self._setDefault(family="gaussian", q=0.2, sigma=-1.0, nSigma=50,
                         fitIntercept=True, labelCol="label",
                         predictionCol="prediction", featureCols=[],
                         tolAbs=-1.0, tolRel=-1.0)
        kwargs = self._input_kwargs
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        self._set(**kwargs)

    @keyword_only
    def setParams(self, **kwargs):
        kwargs = {k: v for k, v in self._input_kwargs.items() if v is not None}
        return self._set(**kwargs)

    def _fit(self, dataset):
        sigma = self.getOrDefault(self.sigma)
        tols = {}
        if self.getOrDefault(self.tolAbs) > 0:
            tols["tol_abs"] = self.getOrDefault(self.tolAbs)
        if self.getOrDefault(self.tolRel) > 0:
            tols["tol_rel"] = self.getOrDefault(self.tolRel)
        fit = owl(
            df=dataset,
            feature_cols=self.getFeatureCols(),
            label_col=self.getOrDefault(self.labelCol),
            family=self.getFamily(),
            q=self.getOrDefault(self.q),
            sigma=[sigma] if sigma > 0 else None,
            n_sigma=self.getOrDefault(self.nSigma),
            intercept=self.getOrDefault(self.fitIntercept),
            **tols,
        )
        model = SlopeModel(owlFit=fit, featureCols=self.getFeatureCols(),
                           predictionCol=self.getOrDefault(self.predictionCol))
        return model


class SlopeModel(Model, _SlopeParams):
    def __init__(self, *, owlFit=None, featureCols=None, predictionCol="prediction"):
        super().__init__()
        self.owlFit = owlFit
        self._setDefault(predictionCol="prediction", featureCols=featureCols or [],
                         family=owlFit.family if owlFit else "gaussian",
                         labelCol="label", q=0.2, sigma=-1.0, nSigma=50,
                         fitIntercept=True)
        if featureCols:
            self._set(featureCols=featureCols)

    def _transform(self, dataset):
        fit = self.owlFit
        kind = "class" if fit.family in ("binomial", "multinomial") else "response"
        out = _predict(fit, df=dataset, feature_cols=self.getFeatureCols(),
                       path_idx=fit.n_sigma - 1, type=kind)
        pred_col = "pred_class" if kind == "class" else "pred_0"
        return out.withColumnRenamed(pred_col, self.getOrDefault(self.predictionCol))

    def coefficients(self, sigma=None) -> np.ndarray:
        from golem_spark.predict import coef_at

        return coef_at(self.owlFit, sigma)

    def feature_importances(self, sigma=None, normalize: bool = True
                            ) -> dict[str, np.ndarray]:
        """caret varImp parity (R/caretOwl.R:228-245): |beta| per
        feature at ``sigma`` (default: the deepest fitted path point,
        the model transform() predicts with), intercept dropped. The
        reference returns raw |beta|; ``normalize=True`` additionally
        scales each target's column to sum 1 so importances are
        comparable across targets/models. Returns {feature: (m,) array}.
        """
        fit = self.owlFit
        if sigma is None:
            beta = fit.coefficients[:, :, fit.n_sigma - 1]
        else:
            from golem_spark.predict import coef_at

            beta = coef_at(fit, sigma, simplify=True)
            if beta.ndim == 3:
                beta = beta[:, :, 0]
        start = 1 if fit.intercept else 0
        imp = np.abs(beta[start:, :])
        if normalize:
            tot = imp.sum(axis=0, keepdims=True)
            imp = np.divide(imp, tot, out=np.zeros_like(imp),
                            where=tot > 0)
        names = fit.feature_names
        return {name: imp[j, :].copy() for j, name in enumerate(names)}
