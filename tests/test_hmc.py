"""HMC/NUTS tests: U-turn bookkeeping vs the recursive definition,
sampling correctness on known targets (KS/moments), dual-averaging
adaptation, and the mixture hp/theta kernels vs exact answers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from common_tpu import models, scalar_functions as sf
from common_tpu import state as st
from common_tpu.kernels import hmc


# ---------------------------------------------------------------------------
# structural: iterative checkpoint U-turn logic == recursive subtree spans
# ---------------------------------------------------------------------------
def _recursive_spans(n):
    """Complete-binary-subtree spans [m, n] the recursive algorithm checks
    when leaf n (odd) completes: spans of length 2^k ending at n for
    k = 1..(#trailing ones of n), each aligned to its own size."""
    spans = []
    k = 1
    while True:
        m = n - 2**k + 1
        if m < 0 or (m % (2**k)) != 0:
            break
        spans.append((m, n))
        k += 1
    return spans


def test_iterative_ckpt_indices_match_recursive_spans():
    """For every odd leaf n, the checkpoint range [idx_min, idx_max] must
    address exactly the momenta at the starts of the recursive spans, and
    the implied span sums must match: verified by simulating the buffer
    protocol with scalar 'momenta' p_i = 2^i (unique-sum encoding)."""
    max_n = 64
    p = 2.0 ** np.arange(max_n)  # unique subset sums
    csum = np.cumsum(p)

    p_ck = np.zeros(20)
    ps_ck = np.zeros(20)
    for n in range(max_n):
        idx_min, idx_max = jax.tree_util.tree_map(
            int, hmc._leaf_to_ckpt_idxs(jnp.int32(n))
        )
        if n % 2 == 0:
            p_ck[idx_max] = p[n]
            ps_ck[idx_max] = csum[n]
        else:
            spans = _recursive_spans(n)
            # one checkpoint per span, in order (deepest span = idx_max)
            assert idx_max - idx_min + 1 == len(spans), (n, idx_min, idx_max)
            for j, (m, _) in enumerate(sorted(spans)):  # widest first
                i = idx_min + j
                span_sum = csum[n] - ps_ck[i] + p_ck[i]
                expect = p[m : n + 1].sum()
                assert span_sum == expect, (n, m, i)
                assert p_ck[i] == p[m], (n, m, i)


def test_nuts_standard_normal_ks():
    logp = lambda x: -0.5 * jnp.sum(x * x)
    samples, info = hmc.sample(
        logp, jnp.zeros(1), jax.random.key(0), num_samples=2000,
        num_warmup=300,
    )
    xs = np.asarray(samples)[:, 0]
    d, p = sps.kstest(xs[::4], "norm")
    assert p > 0.01, (d, p)
    assert not np.asarray(info["diverging"]).any()


def test_nuts_correlated_gaussian_moments():
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.0]])
    prec = jnp.linalg.inv(cov)
    mu = jnp.asarray([1.0, -2.0])
    logp = lambda x: -0.5 * (x - mu) @ prec @ (x - mu)
    samples, _ = hmc.sample(
        logp, jnp.zeros(2), jax.random.key(1), num_samples=4000,
        num_warmup=500,
    )
    xs = np.asarray(samples)
    assert np.allclose(xs.mean(0), np.asarray(mu), atol=0.15), xs.mean(0)
    assert np.allclose(np.cov(xs.T), np.asarray(cov), atol=0.35), np.cov(xs.T)


def test_hmc_kernel_gamma_target():
    """Fixed-length HMC on log-Gamma(3, 2) (positivity via log transform)."""
    a, rate = 3.0, 2.0
    # target over u = log x: logp = a*u - rate*e^u (includes Jacobian)
    logp = lambda u: jnp.sum(a * u - rate * jnp.exp(u))
    samples, info = hmc.sample(
        logp, jnp.zeros(1), jax.random.key(2), num_samples=4000,
        num_warmup=400, kernel="hmc", num_leapfrog=16,
    )
    xs = np.exp(np.asarray(samples)[:, 0])
    d, p = sps.kstest(xs[::4], sps.gamma(a, scale=1.0 / rate).cdf)
    assert p > 0.01, (d, p)
    acc = np.asarray(info["accept_prob"]).mean()
    assert acc > 0.5, acc


def test_dual_averaging_hits_target_accept():
    logp = lambda x: -0.5 * jnp.sum(x * x)
    samples, info = hmc.sample(
        logp, jnp.zeros(4), jax.random.key(3), num_samples=800,
        num_warmup=500, target_accept=0.8,
    )
    acc = np.asarray(info["accept_prob"]).mean()
    assert 0.6 < acc <= 1.0, acc


def test_nuts_hp_matches_conjugate_posterior():
    """bb mixture, single cluster: hyper alpha with Exp prior.  NUTS over
    alpha must match a fine-grid quadrature of the same 1-D posterior."""
    n = 30
    r = np.random.default_rng(0)
    x = (r.random(n) < 0.7).astype(np.int64)
    defn = st.model_definition(n, [models.bb], k_max=4)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    s = st.initialize(
        defn, data, jax.random.key(0),
        assignment=jnp.zeros(n, jnp.int32),
        feature_hps=[{"alpha": 1.0, "beta": 1.0}],
    )
    prior = sf.log_exponential(0.5, field="alpha")
    # NUTS chain over the hyper (beta held by sampling only alpha)
    spec_t = {0: {"alpha": hmc.POSITIVE}}

    def chain(key, niter=1500):
        def body(stt, k):
            stt = hmc.hp(
                stt, data, k, priors={0: prior}, transforms=spec_t,
                step_size=0.3, num_steps=1,
            )
            return stt, stt.hypers[0]["alpha"]

        _, alphas = jax.lax.scan(body, s, jax.random.split(key, niter))
        return np.asarray(alphas)

    alphas = chain(jax.random.key(5))[300:]

    # quadrature truth: p(a) ∝ Exp(a; .5) * B(a+h, 1+t)/B(a, 1)
    from scipy.special import betaln

    h, t = float(x.sum()), float(n - x.sum())
    grid = np.linspace(1e-3, 30, 20001)
    logp = (
        -0.5 * grid
        + betaln(grid + h, 1.0 + t)
        - betaln(grid, 1.0)
    )
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mean_true = (grid * w).sum()
    var_true = ((grid - mean_true) ** 2 * w).sum()
    assert abs(alphas.mean() - mean_true) < 0.35 * np.sqrt(var_true), (
        alphas.mean(), mean_true, np.sqrt(var_true),
    )


def test_nuts_theta_matches_exact_conditional():
    """bbnc latents via NUTS == Beta posterior per cluster (KS)."""
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
            stt = hmc.theta(stt, k, step_size=0.25, num_steps=2)
            return stt, stt.stats[0]["p"]

        _, ps = jax.lax.scan(body, s, jax.random.split(key, 2500))
        return ps

    ps = np.asarray(chain(jax.random.key(6)))[500:]
    d0, p0 = sps.kstest(ps[::5, 0], sps.beta(4, 1).cdf)
    d1, p1 = sps.kstest(ps[::5, 1], sps.beta(2, 3).cdf)
    assert p0 > 0.01 and p1 > 0.01, (p0, p1)


def test_nuts_cluster_hp_moves_and_concentrates():
    """alpha NUTS: many singleton clusters should pull alpha up vs few."""
    n = 12
    defn = st.model_definition(n, [models.bb], k_max=16)
    data = ((jnp.zeros(n), jnp.ones(n)),)
    prior = sf.log_exponential(1.0)

    def posterior_mean_alpha(assignment, key):
        s = st.initialize(
            defn, data, key, assignment=jnp.asarray(assignment, jnp.int32),
            cluster_hp={"alpha": 1.0},
        )

        def body(stt, k):
            stt = hmc.cluster_hp(stt, k, prior, step_size=0.4, num_steps=1)
            return stt, stt.cluster_hp["alpha"]

        _, alphas = jax.lax.scan(body, s, jax.random.split(key, 800))
        return np.asarray(alphas)[200:].mean()

    many = posterior_mean_alpha(np.arange(n) % 12, jax.random.key(7))
    few = posterior_mean_alpha(np.zeros(n), jax.random.key(8))
    assert many > 2.0 * few, (many, few)


def test_nuts_hp_niw_gradient_path():
    """NIW hypers (kappa, nu) under NUTS: runs, stays in support, and the
    marginal-likelihood gradient path is finite (config-3 smoke)."""
    n, d = 40, 3
    r = np.random.default_rng(1)
    X = r.normal(size=(n, d)).astype(np.float32)
    defn = st.model_definition(n, [models.niw(d)], k_max=4)
    data = ((jnp.asarray(X), jnp.ones(n)),)
    s = st.initialize(
        defn, data, jax.random.key(0),
        assignment=(np.arange(n) % 2).astype(np.int32),
    )
    priors = {0: lambda h: sf.log_exponential(0.1, field="kappa")(h)
              + sf.log_exponential(0.05)({"nu": h["nu"] - (d - 1 + 1e-3)})}
    transforms = {0: {"kappa": hmc.POSITIVE,
                      "nu": hmc.lower_bounded(d - 1 + 1e-3)}}
    out = s
    key = jax.random.key(9)
    for i in range(10):
        out = hmc.hp(out, data, jax.random.fold_in(key, i),
                     priors=priors, transforms=transforms,
                     step_size=0.1, num_steps=2)
    kappa = float(out.hypers[0]["kappa"])
    nu = float(out.hypers[0]["nu"])
    assert kappa > 0 and np.isfinite(kappa)
    assert nu > d - 1 and np.isfinite(nu)
    assert kappa != 1.0  # moved off the init
