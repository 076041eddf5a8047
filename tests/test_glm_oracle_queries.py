"""The driver-facing GLM path queries vs their DuckDB oracles at
sf0.001 (fast smoke) — the full sf0.01 check is the driver gate itself.

At sf0.001 the frozen sf0.01 coefficients do NOT apply, so only the
structurally-real rows are compared here: sigma_max (path_idx -1) and
the gaussian Cramer tail. The frozen-row agreement at sf0.01 is covered
by tools/verify_oracle.py and the driver run.
"""

import duckdb
import numpy as np
import pytest

from golem_spark.glm_queries import (
    GLM_QUERIES, GLM_SPECS, _sigma_max_sql, _gaussian_ols_row_sql)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    return con


@pytest.mark.parametrize("fam", list(GLM_SPECS))
def test_sigma_max_matches_duckdb(spark, duck, fam):
    sdf = GLM_QUERIES[f"glm_{fam}_path"](spark, SF).toPandas()
    srow = sdf[sdf.path_idx == -1].iloc[0]
    orow = duck.execute(_sigma_max_sql(fam)).df().iloc[0]
    assert srow["sigma"] == orow["sigma"], (srow["sigma"], orow["sigma"])


def test_gaussian_tail_is_ols(spark, duck):
    sdf = GLM_QUERIES["glm_gaussian_path"](spark, SF).toPandas()
    k = len(GLM_SPECS["gaussian"]["sigmas"]) - 1
    srow = sdf[sdf.path_idx == k].iloc[0]
    orow = duck.execute(_gaussian_ols_row_sql(k)).df().iloc[0]
    for c in ["b0", "b1", "b2", "b3", "dev_ratio"]:
        assert srow[c] == orow[c], (c, srow[c], orow[c])


def test_emitted_values_are_normalized(spark):
    """No -0.0 in the emitted frame (would hash-mismatch DuckDB)."""
    for fam in GLM_SPECS:
        pdf = GLM_QUERIES[f"glm_{fam}_path"](spark, SF).toPandas()
        for c in pdf.columns:
            if pdf[c].dtype == np.float64:
                vals = pdf[c].to_numpy()
                zero = vals == 0.0
                assert not np.any(np.signbit(vals[zero])), (fam, c)


def _wide_cert(fam="gaussian", k=1):
    """(kkt_sql_kwargs, sigma) for the sf0.001 frozen wide golden."""
    from golem_spark.glm_queries import (GLM_WIDE_FROZEN_BY_N, WIDE_P,
                                         WIDE_SPECS,
                                         _WIDE_GLOBAL_BUCKETS_SQL)

    spec = WIDE_SPECS[fam]
    dr, nnz, b0s, nz = GLM_WIDE_FROZEN_BY_N[6000][fam][k]
    sig = spec["sigmas"][k]
    return dict(fam=fam, p=WIDE_P, m=spec["m"],
                buckets=_WIDE_GLOBAL_BUCKETS_SQL, b0s=b0s, nz=nz,
                sigma=sig), sig


def test_wide_kkt_sql_certifies_the_golden(duck):
    """VERDICT r10 item 1: the grouped one-hot gradient certificate
    holds at the frozen wide beta — for every family, incl. the
    all-zero goldens (feasibility-only band)."""
    from golem_spark.glm_queries import (GLM_WIDE_FROZEN_BY_N, WIDE_P,
                                         WIDE_SPECS,
                                         _WIDE_GLOBAL_BUCKETS_SQL,
                                         _wide_kkt_sql)

    for fam, spec in WIDE_SPECS.items():
        for k, sig in enumerate(spec["sigmas"]):
            dr, nnz, b0s, nz = GLM_WIDE_FROZEN_BY_N[6000][fam][k]
            sql = _wide_kkt_sql(fam, WIDE_P, spec["m"],
                                _WIDE_GLOBAL_BUCKETS_SQL, b0s, nz, sig)
            ok = duck.execute(f"SELECT {sql}").fetchone()[0]
            assert ok is True, (fam, k)


def test_wide_kkt_sql_rejects_wrong_beta(duck):
    """The certificate is not vacuous: a perturbed solution, a zeroed
    solution at sigma < sigma_max, and a broken intercept all FAIL."""
    from golem_spark.glm_queries import _wide_kkt_sql

    kwargs, sig = _wide_cert("gaussian", 1)

    def run(**over):
        kw = {**kwargs, **over}
        return duck.execute(
            "SELECT " + _wide_kkt_sql(
                kw["fam"], kw["p"], kw["m"], kw["buckets"], kw["b0s"],
                kw["nz"], kw["sigma"])).fetchone()[0]

    assert run() is True
    # scale every nonzero coefficient 1.5x -> gradient band broken
    bad_nz = tuple((j, t, 1.5 * v) for j, t, v in kwargs["nz"])
    assert run(nz=bad_nz) is False
    # all-zero at sigma < sigma_max -> prefix ratio = sigma_max >> band
    assert run(nz=()) is False
    # broken intercept -> vanishing-gradient check fails
    bad_b0 = tuple(v + 2.0 for v in kwargs["b0s"])
    assert run(b0s=bad_b0) is False


def test_wide_kkt_engine_flags_reject_wrong_beta(spark):
    """The ENGINE-side certificate (_spark_wide_kkt_flags) is equally
    non-vacuous: the real fit passes, a perturbed copy fails."""
    import copy

    from golem_spark.glm_queries import (WIDE_P, WIDE_SPECS, _WIDE_Q,
                                         _spark_wide_kkt_flags,
                                         _wide_sparse_frame)
    from golem_spark.path import owl
    from golem_spark.session import load_tables

    li = load_tables(spark, SF)["lineitem"]
    fam, spec = "gaussian", WIDE_SPECS["gaussian"]
    fr = _wide_sparse_frame(li, fam)
    fit = owl(df=fr, sparse_features=("idx", "val"), sparse_p=WIDE_P,
              label_col="label", family=fam, sigma=spec["sigmas"],
              lam="oscar", q=_WIDE_Q, **spec["owl_kwargs"])
    flags = _spark_wide_kkt_flags(fr, fam, fit, spec["sigmas"], WIDE_P)
    assert flags == {0: True, 1: True}
    bad = copy.deepcopy(fit)
    bad.coefficients = bad.coefficients * 1.5
    flags = _spark_wide_kkt_flags(fr, fam, bad, spec["sigmas"], WIDE_P)
    assert flags[1] is False


def test_cv_warm_start_survives_mid_grid_kill(spark, monkeypatch):
    """Warm starts added driver state to the CV queries (frozen goldens
    loaded per fit). Pin the restart contract (VERDICT r13 item 7):
    kill a CV run mid-grid, then verify a fresh run from the SAME
    frozen goldens reproduces the 1e-6-rounded outputs exactly —
    i.e. ``beta_init`` carries no cross-fit or cross-run state."""
    import golem_spark.glm_queries as gq

    q = gq.GLM_QUERIES["glm_cv_binomial"]
    ref = [tuple(r) for r in q(spark, SF).collect()]

    orig = gq._cv_warm_starts
    state = {"cells": 0, "warm": False}

    def boom(fam, n, m, n_sigma):
        by_cell, full_bi = orig(fam, n, m, n_sigma)
        assert by_cell is not None  # sf0.001 must actually be warm
        state["warm"] = True

        def killed(qv, fold, rep):
            state["cells"] += 1
            if state["cells"] == 3:  # mid-grid: after 2 cells started
                raise RuntimeError("simulated mid-grid kill")
            return by_cell(qv, fold, rep)

        return killed, full_bi

    monkeypatch.setattr(gq, "_cv_warm_starts", boom)
    with pytest.raises(RuntimeError, match="mid-grid kill"):
        q(spark, SF)
    assert state["warm"] and state["cells"] >= 3
    monkeypatch.setattr(gq, "_cv_warm_starts", orig)

    again = [tuple(r) for r in q(spark, SF).collect()]
    assert again == ref
