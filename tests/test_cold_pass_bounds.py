"""Cold-solve efficiency pins (VERDICT r13 item 2).

Since r13 the bench/gate GLM fits polish from frozen goldens
(``beta_init`` warm starts), so bench no longer measures cold-solve
cost: a cold-path regression in line search, screening, or the
prox-Newton caches would be invisible everywhere except host-noisy
single-run scale-audit ceilings. These tests fit the four wide queries
and one narrow path COLD at sf0.01 and assert the per-point solver
pass counts stay within recorded bounds (measured r14, post
poisson-gap tightening):

* narrow poisson path  [2, 1, 1, 1, 1, 1]   (warm-chain + eval reuse)
* wide gaussian  ADMM iterations [2968, 158] (driver-local on Gram)
* wide binomial  [7, 10]  (gap 1e-9)
* wide poisson   [1, 3]   (gap 1e-8)
* wide multinomial [1, 12] (gap 1e-10)

Bounds carry ~50% headroom: benign solver drift stays green, a
doubled pass count (one lost warm-chain or line-search regression)
fails. Distributed-pass families pay one corpus scan per pass at
100 TB — this is the cost being pinned.
"""

import pytest

from golem_spark.path import owl

SF = "/root/testdata/sf0.01"


def test_narrow_poisson_path_cold_passes(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from golem_spark.glm_queries import GLM_SPECS, _Q
    from golem_spark.session import load_tables

    spec = GLM_SPECS["poisson"]
    li = load_tables(spark, SF)["lineitem"]
    fit = owl(df=li, feature_cols=spec["features"], label_col=spec["label"],
              family="poisson", sigma=spec["sigmas"], lam="bh", q=_Q,
              beta_init=None, **spec["owl_kwargs"])
    passes = [int(x) for x in fit.passes]
    assert len(passes) == 6
    assert passes[0] <= 3, passes       # cold start: measured 2
    assert all(pk <= 2 for pk in passes[1:]), passes  # warm chain: 1 each
    assert sum(passes) <= 10, passes    # measured 7


@pytest.mark.parametrize("fam,bound", [
    # gaussian's "passes" are driver-local ADMM iterations on the
    # cached Gram (measured 3126 total) — the distributed cost is the
    # constant stats+Gram build, asserted by the tall-n 3-job audit;
    # the bound catches an ADMM convergence blowup, not scan count
    ("gaussian", 5000),
    ("binomial", 25),      # measured sum 17 at gap 1e-9
    ("poisson", 8),        # measured sum 4 at gap 1e-8
    ("multinomial", 20),   # measured sum 13 at gap 1e-10
])
def test_wide_cold_passes(spark, fam, bound):
    from golem_spark.glm_queries import (WIDE_SPECS, _WIDE_Q,
                                         _wide_shared_context)

    spec = WIDE_SPECS[fam]
    ctx = _wide_shared_context(spark, SF)
    fit = owl(family=fam, sigma=spec["sigmas"], lam="oscar", q=_WIDE_Q,
              beta_init=None,
              _prebuilt=(ctx["backends"][fam], ctx["metas"][fam]),
              gram_cache=ctx["gram_cache"], **spec["owl_kwargs"])
    passes = [int(x) for x in fit.passes]
    assert sum(passes) <= bound, (fam, passes)
