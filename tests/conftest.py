import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from golem_spark.session import get_spark

    s = get_spark("golem_spark_tests", shuffle_partitions=8)
    yield s


def random_problem(n=100, p=10, q=0.3, n_targets=1, density=1.0,
                   amplitude=3.0, sigma_noise=1.0, response="gaussian",
                   rho=0.0, seed=42):
    """Deterministic reimplementation of the reference's randomProblem
    generator (R/utils.R:15-76): N(0,1) features (optionally sparse /
    equicorrelated), planted signed signals, family response links."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, p))
    if density < 1.0:
        mask = rng.random((n, p)) < density
        x = x * mask
    if rho > 0:
        z = rng.standard_normal((n, 1))
        x = x + np.sqrt(rho / (1 - rho)) * z

    m = n_targets
    k = max(1, int(q * p * m))
    beta = np.zeros(p * m)
    idx = rng.choice(p * m, size=k, replace=False)
    beta[idx] = amplitude * rng.choice([-1.0, 1.0], size=k)
    beta = beta.reshape(p, m)

    lp = x @ beta
    if response == "gaussian":
        y = lp[:, 0] + sigma_noise * rng.standard_normal(n)
    elif response == "binomial":
        y = (np.sign(lp[:, 0] + sigma_noise * rng.standard_normal(n)) + 1) / 2
    elif response == "poisson":
        y = rng.poisson(np.exp(np.clip(lp[:, 0], -20, 20)))
    elif response == "multinomial":
        full = np.hstack([lp, np.zeros((n, 1))])
        pr = np.exp(full - full.max(axis=1, keepdims=True))
        pr /= pr.sum(axis=1, keepdims=True)
        y = np.array([rng.choice(m + 1, p=pr[i]) for i in range(n)])
    else:
        raise ValueError(response)
    return x, y, beta
