"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()`` exposes
every implemented operator (SURVEY.md §2) as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from golem_spark.session import load_tables
from golem_spark.kernels import KERNELS
from golem_spark.pipeline.kernels import PIPELINE_ORACLES, PIPELINE_QUERIES


def _kernel_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(KERNELS[name].spark_sql)

    run.__name__ = f"query_{name}"
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped-aggregation substrate (K18) on sf0.001."""
    load_tables(spark, "/root/testdata/sf0.001")
    return spark.sql(KERNELS["k18_grouped_agg"].spark_sql)


def _glm_gaussian_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: distributed gaussian SLOPE path on lineitem
    (iterative solver — not SQL-expressible; the statistical oracles live
    in tests/)."""
    from pyspark.sql import functions as F

    from golem_spark.path import owl

    import pandas as pd

    li = load_tables(spark, sf_dir)["lineitem"]
    fit = owl(df=li, feature_cols=["l_extendedprice", "l_discount", "l_tax"],
              label_col="l_quantity", family="gaussian", n_sigma=20)
    pdf = pd.DataFrame({
        "path_idx": [int(k) for k in range(fit.n_sigma)],
        "sigma": [float(round(fit.sigma[k], 8)) for k in range(fit.n_sigma)],
        "dev_ratio": [float(round(fit.deviance_ratio[k], 6)) for k in range(fit.n_sigma)],
        "n_nonzero": [int((abs(fit.coefficients[1:, 0, k]) > 1e-12).sum())
                      for k in range(fit.n_sigma)],
    })
    # pandas -> Arrow -> LocalRelation: no RDD parallelize / Python workers
    return spark.createDataFrame(pdf, "path_idx int, sigma double, dev_ratio double, n_nonzero int") \
        .orderBy(F.col("path_idx"))


def _glm_binomial_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: distributed binomial (prox-Newton) path —
    classify l_returnflag='R' from lineitem numerics."""
    from pyspark.sql import functions as F

    from golem_spark.path import owl

    import pandas as pd

    li = load_tables(spark, sf_dir)["lineitem"]
    li = li.withColumn("is_r", F.when(F.col("l_returnflag") == "R", "R").otherwise("other"))
    fit = owl(df=li, feature_cols=["l_quantity", "l_extendedprice", "l_discount"],
              label_col="is_r", family="binomial", n_sigma=8)
    pdf = pd.DataFrame({
        "path_idx": [int(k) for k in range(fit.n_sigma)],
        "sigma": [float(round(fit.sigma[k], 8)) for k in range(fit.n_sigma)],
        "dev_ratio": [float(round(fit.deviance_ratio[k], 6)) for k in range(fit.n_sigma)],
    })
    return spark.createDataFrame(pdf, "path_idx int, sigma double, dev_ratio double") \
        .orderBy(F.col("path_idx"))


def _path_frame(spark: SparkSession, fit) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({
        "path_idx": [int(k) for k in range(fit.n_sigma)],
        "sigma": [float(round(fit.sigma[k], 8)) for k in range(fit.n_sigma)],
        "dev_ratio": [float(round(fit.deviance_ratio[k], 6)) for k in range(fit.n_sigma)],
    })
    return spark.createDataFrame(pdf, "path_idx int, sigma double, dev_ratio double") \
        .orderBy(F.col("path_idx"))


def _glm_poisson_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: distributed poisson (prox-Newton) path — model
    the l_linenumber count from lineitem numerics."""
    from golem_spark.path import owl

    li = load_tables(spark, sf_dir)["lineitem"]
    fit = owl(df=li, feature_cols=["l_extendedprice", "l_discount", "l_tax"],
              label_col="l_linenumber", family="poisson", n_sigma=5)
    return _path_frame(spark, fit)


def _glm_multinomial_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: distributed multinomial path — classify the
    3-class l_returnflag (A/N/R) from lineitem numerics (full-rank m-1
    parameterization, exact block Hessian)."""
    from golem_spark.path import owl

    li = load_tables(spark, sf_dir)["lineitem"]
    fit = owl(df=li, feature_cols=["l_quantity", "l_extendedprice", "l_discount"],
              label_col="l_returnflag", family="multinomial", n_sigma=5)
    return _path_frame(spark, fit)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in KERNELS:
        out[name] = _kernel_query(name)
    out.update(PIPELINE_QUERIES)
    out["glm_gaussian_path"] = _glm_gaussian_path
    out["glm_binomial_path"] = _glm_binomial_path
    out["glm_poisson_path"] = _glm_poisson_path
    out["glm_multinomial_path"] = _glm_multinomial_path
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: k.duck_sql for name, k in KERNELS.items()}
    out.update(PIPELINE_ORACLES)
    return out
