"""Escobar–West concentration sampler vs quadrature truth + profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln as sgammaln

from common_tpu import models
from common_tpu import state as st
from common_tpu.kernels import gibbs
from common_tpu.utils import profiling


def test_escobar_west_matches_quadrature():
    """Stationary dist of the EW kernel == p(alpha | K+, n) by quadrature."""
    n, kplus = 30, 6
    a, b = 1.5, 0.5
    # a state with 6 occupied clusters over 30 rows
    assignment = np.repeat(np.arange(kplus), n // kplus)
    defn = st.model_definition(n, [models.bb], k_max=10)
    data = ((jnp.zeros(n), jnp.ones(n)),)
    s = st.initialize(defn, data, jax.random.key(0),
                      assignment=jnp.asarray(assignment, jnp.int32),
                      cluster_hp={"alpha": 1.0})

    @jax.jit
    def chain(s, key):
        def body(stt, k):
            stt = gibbs.cluster_hp_escobar_west(stt, k, a=a, b=b)
            return stt, stt.cluster_hp["alpha"]

        return jax.lax.scan(body, s, jax.random.split(key, 6000))[1]

    alphas = np.asarray(chain(s, jax.random.key(1)))[1000:]

    # quadrature: p(alpha) ∝ Gamma(alpha; a, b) alpha^K Γ(alpha)/Γ(alpha+n)
    grid = np.linspace(1e-3, 40, 40001)
    logp = (
        (a - 1) * np.log(grid) - b * grid
        + kplus * np.log(grid)
        + sgammaln(grid) - sgammaln(grid + n)
    )
    w = np.exp(logp - logp.max()); w /= w.sum()
    mean_true = float((grid * w).sum())
    var_true = float(((grid - mean_true) ** 2 * w).sum())
    assert abs(alphas.mean() - mean_true) < 0.2 * np.sqrt(var_true), (
        alphas.mean(), mean_true,
    )
    assert abs(alphas.var() / var_true - 1.0) < 0.35, (alphas.var(), var_true)


def test_ew_in_runner_config():
    from common_tpu.runner import runner

    n = 40
    r = np.random.default_rng(0)
    x = r.integers(0, 2, n)
    defn = st.model_definition(n, [models.bb], k_max=8)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    s = st.initialize(defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0})
    run = runner(defn, data, s, [("assign", {}), ("ew_cluster_hp", {"a": 1.0, "b": 1.0})])
    out = run.run(jax.random.key(1), 20)
    assert float(out.cluster_hp["alpha"]) > 0
    assert np.isfinite(run.score_trace).all()


def test_benchmark_utility():
    @jax.jit
    def step(x):
        return x @ x

    x = jnp.ones((128, 128))
    res = profiling.benchmark(step, x, iters=3, warmup=1)
    assert res["min_s"] > 0 and res["iters_per_s"] > 0
    assert res["min_s"] <= res["median_s"] <= res["mean_s"] * 3


def test_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)
