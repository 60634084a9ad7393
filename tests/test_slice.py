"""Slice sampler tests: univariate correctness, theta vs exact conditional,
hp posterior sanity, and the full non-conjugate enumeration battery with
slice replacing the exact conditional."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from common_tpu import models, testutil
from common_tpu import state as st
from common_tpu.kernels import slice_
from common_tpu.runner import run_chain

from test_gibbs_exact import exact_partition_posterior, sampled_partitions


def _chain_slice(key, x0, logf, n, w=1.0, lower=-jnp.inf, upper=jnp.inf):
    def body(x, k):
        x = slice_.slice_sample(k, x, logf, w=w, lower=lower, upper=upper)
        return x, x

    _, xs = jax.lax.scan(body, jnp.asarray(x0, jnp.float32),
                         jax.random.split(key, n))
    return np.asarray(xs)


def test_slice_samples_standard_normal():
    logf = lambda x: -0.5 * x * x
    xs = _chain_slice(jax.random.key(0), 0.3, logf, 4000, w=2.0)[500:]
    # KS test against N(0,1)
    d, p = sps.kstest(xs[::5], "norm")
    assert p > 0.01, (d, p)


def test_slice_samples_beta_with_bounds():
    a, b = 3.0, 1.5
    logf = lambda x: (a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x)
    xs = _chain_slice(
        jax.random.key(1), 0.5, logf, 4000, w=0.3, lower=1e-6, upper=1 - 1e-6
    )[500:]
    d, p = sps.kstest(xs[::5], sps.beta(a, b).cdf)
    assert p > 0.01, (d, p)


def test_slice_theta_matches_exact_conditional():
    """bbnc: slice.theta stationary dist == Beta(a+h, b+t) per cluster."""
    n = 6
    defn = st.model_definition(n, [models.bbnc], k_max=4)
    x = jnp.asarray([1, 1, 1, 0, 1, 0])
    data = ((x, jnp.ones(n)),)
    s = st.initialize(
        defn, data, jax.random.key(0),
        assignment=jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32),
    )

    @jax.jit
    def chain(key):
        def body(stt, k):
            stt = slice_.theta(stt, k, w=0.3)
            return stt, stt.stats[0]["p"]

        _, ps = jax.lax.scan(body, s, jax.random.split(key, 3000))
        return ps

    ps = np.asarray(chain(jax.random.key(2)))[500:]
    # cluster 0: heads=3, tails=0 -> Beta(1+3, 1+0); cluster 1: Beta(2, 3)
    d0, p0 = sps.kstest(ps[::5, 0], sps.beta(4, 1).cdf)
    d1, p1 = sps.kstest(ps[::5, 1], sps.beta(2, 3).cdf)
    assert p0 > 0.01 and p1 > 0.01, (p0, p1)


def test_slice_hp_bb_alpha_posterior_moves():
    """slice.hp on bb's alpha: chain must move and stay in support, and the
    posterior should concentrate below the prior mean for tails-heavy data."""
    n = 40
    r = np.random.default_rng(0)
    x = (r.random(n) < 0.15).astype(np.int64)  # mostly tails
    defn = st.model_definition(n, [models.bb], k_max=4)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    s = st.initialize(
        defn, data, jax.random.key(0),
        assignment=jnp.zeros(n, jnp.int32),
        feature_hps=[{"alpha": 5.0, "beta": 1.0}],
    )
    from common_tpu import scalar_functions as sf

    spec = {0: {"alpha": {"prior": sf.log_exponential(0.5),
                          "w": 1.0, "bounds": (1e-4, 100.0)}}}

    @jax.jit
    def chain(key):
        def body(stt, k):
            stt = slice_.hp(stt, data, k, spec)
            return stt, stt.hypers[0]["alpha"]

        _, alphas = jax.lax.scan(body, s, jax.random.split(key, 1500))
        return alphas

    alphas = np.asarray(chain(jax.random.key(3)))[300:]
    assert alphas.std() > 0.05  # actually mixing
    assert np.all(alphas > 0)
    assert alphas.mean() < 5.0  # pulled below the (deliberately high) init


@pytest.mark.slow
def test_neal8_bbnc_with_slice_theta_matches_enumeration():
    """Full non-conjugate pipeline with slice (no exact conditional used)."""
    r = np.random.default_rng(4)
    n = 4
    x = r.integers(0, 2, size=n)
    bb_defn = st.model_definition(n, [models.bb], k_max=5)
    bbnc_defn = st.model_definition(n, [models.bbnc], k_max=5)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    chp = {"alpha": 1.5}
    exact = exact_partition_posterior(bb_defn, data, chp)
    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            cache[nsweeps] = sampled_partitions(
                bbnc_defn, data, chp,
                [("assign_resample", {"m": 3}),
                 ("slice_theta", {"w": 0.3})],
                nsweeps, seed=len(cache),
            )
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=4000, ntries=3, kl_tol=0.03
    )


@pytest.mark.slow
def test_vector_hyper_slice_dd_matches_quadrature():
    """Coordinate-scan slice over dd's COUPLED alpha vector: the sampled
    (alpha0, alpha1) posterior means must match 2-D quadrature.  (dd's
    marginal has a lnGamma(sum alpha) term, so a simultaneous per-
    coordinate update would be invalid — this pins the sequential scan.)"""
    from common_tpu import scalar_functions as sf

    r = np.random.default_rng(0)
    n = 24
    x = r.integers(0, 2, size=n)
    defn = st.model_definition(n, [models.dd(2)], k_max=4)
    data = ((jnp.asarray(x, jnp.int32), jnp.ones(n)),)
    z0 = jnp.asarray(r.integers(0, 2, size=n), jnp.int32)
    state0 = st.initialize(defn, data, jax.random.key(0),
                           cluster_hp={"alpha": 1.0}, assignment=z0)
    lik = state0.likelihoods()[0]
    prior = sf.log_exponential(1.0)

    # quadrature posterior of (a0, a1) | z fixed
    grid = np.linspace(0.02, 8.0, 120)
    G0, G1 = np.meshgrid(grid, grid, indexing="ij")
    logp = np.zeros_like(G0)
    active = np.asarray(state0.counts) > 0
    for i in range(len(grid)):
        for j in range(len(grid)):
            h = {"alphas": jnp.asarray([grid[i], grid[j]], jnp.float32)}
            ml = np.asarray(lik.marginal_loglik(h, state0.stats[0]))
            logp[i, j] = (ml[active].sum() + float(prior(grid[i]))
                          + float(prior(grid[j])))
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mean_quad = np.array([(w * G0).sum(), (w * G1).sum()])

    specs = {0: {"alphas": {"prior": prior, "w": 1.0,
                            "bounds": (0.02, 8.0)}}}
    s = state0
    draws = []
    for t in range(600):
        s = slice_.hp(s, data, jax.random.fold_in(jax.random.key(5), t),
                      specs)
        if t >= 100:
            draws.append(np.asarray(s.hypers[0]["alphas"]))
    mean_mcmc = np.mean(draws, axis=0)
    assert np.allclose(mean_mcmc, mean_quad, rtol=0.12), (
        mean_mcmc, mean_quad)
