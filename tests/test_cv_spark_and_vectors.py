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
