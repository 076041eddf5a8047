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
