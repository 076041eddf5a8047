"""golem_spark — a PySpark-native SLOPE (sorted-L1 penalized) GLM engine.

A ground-up re-expression of the capabilities of the reference R package
``owl`` (jolars/golem, later SLOPE on CRAN) on Apache Spark: GLM path
fitting with the sorted-L1 norm over DataFrames, plus preprocessing,
prediction, scoring, cross-validation, and the large-scale data-pipeline
operators (dedup, similarity search, text analysis) a 100 TB training-data
pipeline needs.

Architecture (Spark-first, not a port):

- Data-sized work (gradients, Gram matrices, losses, predictions, scores)
  runs as Spark DataFrame aggregations — Catalyst/Tungsten pick the
  physical plan, partial aggregation is map-side, nothing is collected
  except p-sized (model-sized) vectors.
- Model-sized work (sorted-L1 prox, screening rules, KKT checks, the
  FISTA/ADMM iteration control, path management) runs on the driver in
  numpy — p is small even when n is 100 TB.
- For reference-scale data (n·p fits in driver memory) a local numpy
  backend executes the identical operator contract without per-iteration
  cluster round-trips.
"""

from golem_spark.version import __version__
from golem_spark.path import owl, OwlFit
from golem_spark.predict import coef_at, predict
from golem_spark.score import score, deviance
from golem_spark.cv import train_owl, train_owl_spark, TrainedOwl
from golem_spark.vectors import (columns_to_vector, vector_to_columns,
                                 vector_to_sparse_arrays)

__all__ = [
    "__version__",
    "owl",
    "OwlFit",
    "coef_at",
    "predict",
    "score",
    "deviance",
    "train_owl",
    "train_owl_spark",
    "TrainedOwl",
    "columns_to_vector",
    "vector_to_columns",
    "vector_to_sparse_arrays",
]
