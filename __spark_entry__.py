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
    return out


def oracle_sql() -> dict[str, str]:
    return {name: k.duck_sql for name, k in KERNELS.items()}
