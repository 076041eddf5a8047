"""Distributed CV (train_owl_spark) and VectorUDT interop."""

import numpy as np
import pandas as pd

from golem_spark.cv import train_owl_spark
from golem_spark.path import owl
from golem_spark.vectors import columns_to_vector, vector_to_columns
from tests.conftest import random_problem


def test_train_owl_spark_gaussian(spark):
    x, y, _ = random_problem(n=200, p=4, seed=70)
    pdf = pd.DataFrame({f"x{j}": x[:, j] for j in range(4)})
    pdf["label"] = y
    pdf["row_id"] = np.arange(200)
    df = spark.createDataFrame(pdf)
    cv = train_owl_spark(df, [f"x{j}" for j in range(4)], "label", "row_id",
                         q=(0.2,), number=3, family="gaussian", n_sigma=8,
                         max_workers=2)
    assert "mse" in cv.optima
    assert cv.optima["mse"]["mean"] > 0
    assert cv.fit.n_sigma >= 1


def test_vector_roundtrip(spark):
    x, y, _ = random_problem(n=100, p=3, seed=71)
    pdf = pd.DataFrame({f"x{j}": x[:, j] for j in range(3)})
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    vec_df = columns_to_vector(df, [f"x{j}" for j in range(3)])
    assert "features" in vec_df.columns
    back, names = vector_to_columns(vec_df, "features")
    assert names == ["f0", "f1", "f2"]
    got = back.select(*names).toPandas().to_numpy()
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(x, axis=0), atol=1e-12)
    # fit straight from an MLlib-style vector column
    fit = owl(df=back, feature_cols=names, label_col="label",
              family="gaussian", n_sigma=5)
    assert fit.n_sigma >= 1


def test_grouped_gaussian_cv_equals_per_cell(spark):
    """Metamorphic: the grouped-moments gaussian CV route (one scan per
    repeat, cells solved from complement sufficient statistics) agrees
    with the per-cell filtered-DataFrame route at ADMM solution
    tolerance, and actually runs as a bounded number of Spark jobs."""
    x, y, _ = random_problem(n=500, p=6, seed=77)
    pdf = pd.DataFrame({f"x{j}": x[:, j] for j in range(6)})
    pdf["label"] = y
    pdf["row_id"] = np.arange(500)
    df = spark.createDataFrame(pdf)
    feats = [f"x{j}" for j in range(6)]
    kw = dict(q=(0.2,), number=3, family="gaussian", n_sigma=6,
              measure="mse", max_workers=2, keep_cell_fits=True)

    sc = spark.sparkContext
    sc.setJobGroup("cv_grouped_test", "grouped CV job bound", False)
    a = train_owl_spark(df, feats, "label", "row_id", **kw)
    sc.setJobGroup("", "", False)
    jobs = sc.statusTracker().getJobIdsForGroup("cv_grouped_test")
    # one grouped moments pass (createDataFrame frames may add an AQE
    # stage-job); cells, full fit AND held-out mse are driver-local
    assert len(jobs) <= 3, len(jobs)

    b = train_owl_spark(df, feats, "label", "row_id", _grouped=False, **kw)
    for cell, ca in a.cell_fits.items():
        cb = b.cell_fits[cell]
        assert ca.n_sigma == cb.n_sigma
        np.testing.assert_allclose(ca.coefficients, cb.coefficients,
                                   atol=5e-4)
    sa = {(r["fold"], r["measure"]): r["scores"] for r in a.data}
    sb = {(r["fold"], r["measure"]): r["scores"] for r in b.data}
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_allclose(sa[k], sb[k], atol=1e-4)
