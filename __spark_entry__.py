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
from golem_spark.glm_queries import GLM_QUERIES, glm_oracles
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in KERNELS:
        out[name] = _kernel_query(name)
    out.update(PIPELINE_QUERIES)
    # GLM path fits at pinned sigmas, fully oracle-checked: sigma_max and
    # the gaussian tail are recomputed in SQL, and every fitted row's
    # dev_ratio is re-derived by DuckDB from the emitted coefficients
    # (golem_spark/glm_queries.py).
    out.update(GLM_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: k.duck_sql for name, k in KERNELS.items()}
    out.update(PIPELINE_ORACLES)
    out.update(glm_oracles())
    return out
