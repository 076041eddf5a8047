"""A/B for the shared CV source (VERDICT r10 item 7): time the seven
_cv_source-backed queries with SPARK_GRAFT_CV_SHARED on vs off, bench
protocol (certificates off, cold pass + per-query min of two steady
windows, CPU canary stamped). Run each arm in a FRESH process:

  SPARK_GRAFT_CV_SHARED=1 python tools/ab_cv_shared.py [sf_dir]
  SPARK_GRAFT_CV_SHARED=0 python tools/ab_cv_shared.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_GLM_CERTIFICATES", "0")

QUERIES = [
    "glm_cv_gaussian", "glm_cv_binomial", "glm_cv_poisson",
    "glm_cv_multinomial", "glm_score_binomial", "glm_weighted_auc",
    "glm_segment_auc",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import _cpu_canary_sec
    from golem_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = os.environ.get("SPARK_GRAFT_CV_SHARED", "1")
    spark = get_spark("ab_cv_shared")
    fns = entrymod.queries()

    def window():
        out = {}
        for name in QUERIES:
            t0 = time.monotonic()
            fns[name](spark, sf_dir).count()
            out[name] = round(time.monotonic() - t0, 4)
        return out

    canary = [_cpu_canary_sec()]
    cold = window()          # cold: codegen + (shared mode) the persist
    w1 = window()
    canary.append(_cpu_canary_sec())
    w2 = window()
    canary.append(_cpu_canary_sec())
    best = {n: min(w1[n], w2[n]) for n in QUERIES}
    print(json.dumps({
        "mode": f"cv_shared={mode}", "sf_dir": sf_dir,
        "total_best_sec": round(sum(best.values()), 4),
        "cold_total_sec": round(sum(cold.values()), 4),
        "queries": best, "queries_cold": cold,
        "canary_sec": canary,
    }))


if __name__ == "__main__":
    main()
