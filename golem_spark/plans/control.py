"""FitControl — the engine's logical plan for a GLM path fit.

The reference's `control` list (R/owl.R:415-440) is its IR between the
R API and the C++ executor; here the same role is played by a typed
dataclass the API layer builds and the path executor consumes. Keeping
it explicit makes fits reproducible (a FitControl + data reference fully
determines the result) and serializable for job submission.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class FitControl:
    family: str = "gaussian"
    intercept: bool = True
    center: bool = True
    scale: str = "l2"
    lambda_kind: str = "gaussian"          # bh | gaussian | oscar | user
    user_lambda: list | None = None
    sigma: list | None = None              # None -> auto geometric grid
    n_sigma: int = 100
    q: float | None = None
    lambda_min_ratio: float | None = None
    screening: bool = True
    tol_dev_change: float = 1e-5
    tol_dev_ratio: float = 0.995
    tol_abs: float = 1e-5
    tol_rel: float = 1e-4
    tol_rel_gap: float = 1e-5
    tol_infeas: float = 1e-3
    max_variables: int | None = None
    max_passes: int = 10**6
    diagnostics: bool = False
    feature_cols: list = field(default_factory=list)
    label_col: str | None = None

    def to_owl_kwargs(self) -> dict:
        """Keyword arguments for golem_spark.path.owl()."""
        kw = dict(
            family=self.family, intercept=self.intercept, center=self.center,
            scale=self.scale, sigma=self.sigma, n_sigma=self.n_sigma,
            q=self.q, lambda_min_ratio=self.lambda_min_ratio,
            screening=self.screening, tol_dev_change=self.tol_dev_change,
            tol_dev_ratio=self.tol_dev_ratio, tol_abs=self.tol_abs,
            tol_rel=self.tol_rel, tol_rel_gap=self.tol_rel_gap,
            tol_infeas=self.tol_infeas, max_variables=self.max_variables,
            max_passes=self.max_passes, diagnostics=self.diagnostics,
        )
        kw["lam"] = self.user_lambda if self.lambda_kind == "user" else self.lambda_kind
        return kw

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "FitControl":
        return cls(**d)
