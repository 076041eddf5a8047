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


def _verification_rank() -> dict[str, int]:
    """Map query name -> latest driver round that hash-verified it.

    The driver's correctness gate caps at 50 queries taken from the head
    of ``queries()`` (VERDICT r4 item 3), so we rotate never-verified and
    least-recently-verified entries to the front each round. Reading the
    CORRECTNESS_r*.json records keeps the rotation automatic.
    """
    import glob
    import json
    import os
    import re

    last: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        for name, row in rec.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, -1), rnd)
    return last


def _rotated(names: list[str]) -> list[str]:
    rank = _verification_rank()
    # never-verified first (rank -1), then oldest-verified round first.
    # Tie-break is registration order (oldest waiting first) in BOTH
    # groups: the long-waiting backlog must drain through the driver's
    # 50-query window before any freshly registered query takes a slot
    # (VERDICT r5 item 1). New registrations per round are capped so the
    # backlog + new queries fit the window.
    idx = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (rank.get(n, -1), idx[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in KERNELS:
        base[name] = _kernel_query(name)
    base.update(PIPELINE_QUERIES)
    # GLM path fits at pinned sigmas, fully oracle-checked: sigma_max and
    # the gaussian tail are recomputed in SQL, and every fitted row's
    # dev_ratio is re-derived by DuckDB from the emitted coefficients
    # (golem_spark/glm_queries.py).
    base.update(GLM_QUERIES)
    return {name: base[name] for name in _rotated(list(base))}


def oracle_sql() -> dict[str, str]:
    base = {name: k.duck_sql for name, k in KERNELS.items()}
    base.update(PIPELINE_ORACLES)
    base.update(glm_oracles())
    return {name: base[name] for name in _rotated(list(base))}
