"""Fused non-gaussian CV route (r15): metamorphic pins.

The fused route replaces, per warm pinned-sigma CV query, k x (stats +
persist + warm-prefetch + scoring) corpus scans with ONE grouped stats
pass + ONE masked prefetch-and-score pass. These tests pin that it
produces the per-cell route's results: identical coefficients (warm
cells return their golden start unchanged in both routes) and held-out
scores equal to aggregation-order precision.
"""

import numpy as np
import pytest

from golem_spark.cv import train_owl_spark
from golem_spark.glm_queries import CV_SPECS, _cv_source, _cv_warm_starts

SF_DIR = "/root/testdata/sf0.01"


def _run(spark, fam, grouped):
    sp = CV_SPECS[fam]
    li = _cv_source(spark, SF_DIR, fam)
    by_cell, full_bi = _cv_warm_starts(fam, li.count(), sp.get("m", 1),
                                       len(sp["sigmas"]))
    assert by_cell is not None, "test requires the frozen warm starts"
    return train_owl_spark(
        li, sp["features"], sp["label"], sp["key"], q=(sp["q"],),
        number=sp["number"], measure=sp.get("measure", "mse"), family=fam,
        sigma=sp["sigmas"], keep_cell_fits=True, beta_init_by_cell=by_cell,
        full_beta_init=full_bi, max_workers=sp["number"], _grouped=grouped)


@pytest.mark.parametrize("fam", ["binomial", "poisson", "multinomial"])
def test_fused_equals_per_cell(spark, fam):
    fused = _run(spark, fam, None)       # default: fused route
    percell = _run(spark, fam, False)    # _grouped=False: per-cell route

    # near-identical cell coefficients: warm cells return the golden
    # start unchanged in both routes (prox_newton's entry gap test),
    # but each route standardizes with ITS OWN stats-pass summation
    # order, so the unrescale->rescale round trip can differ by an ulp
    # (observed max 2e-25 absolute). The tolerance sits ~6 orders below
    # the query's 1e-6 emission rounding.
    for cell, fit in percell.cell_fits.items():
        np.testing.assert_allclose(
            fused.cell_fits[cell].coefficients, fit.coefficients,
            rtol=1e-12, atol=1e-15, err_msg=f"{fam} cell {cell}")

    # held-out scores: same per-row expressions, different aggregation
    # order (numpy partials vs per-cell Catalyst aggregation) — equal
    # far below the 1e-6 rounding the query emits
    key = lambda d: (d["q"], d["fold"], d["repeat"], d["measure"])
    a = {key(d): d["scores"] for d in fused.data}
    b = {key(d): d["scores"] for d in percell.data}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-9, atol=1e-12,
                                   err_msg=f"{fam} {k}")

    # and the aggregated optima agree
    for meas, opt in percell.optima.items():
        f_opt = fused.optima[meas]
        assert f_opt["q"] == opt["q"]
        assert f_opt["path_idx"] == opt["path_idx"]
        np.testing.assert_allclose(f_opt["mean"], opt["mean"], rtol=1e-9)


def test_fused_route_engaged(spark):
    """The gate must actually select the fused route for the bench CV
    shape — catch silent fallbacks to the per-cell path."""
    import golem_spark.cv as cv

    called = {}
    orig = cv._fused_cv_setup

    def spy(*a, **kw):
        r = orig(*a, **kw)
        called["setup"] = r is not None
        return r

    cv._fused_cv_setup = spy
    try:
        _run(spark, "binomial", None)
    finally:
        cv._fused_cv_setup = orig
    assert called.get("setup"), "fused CV setup did not engage"
