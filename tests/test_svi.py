"""SVI tests.

Layers tested bottom-up:
  1. exponential-family machinery: E_q[log p(x|θ)] and KL(q‖p) from
     autodiff of each family's log-partition vs Monte Carlo / quadrature;
  2. full-batch CAVI: exact ELBO monotonicity (the coordinate-ascent
     guarantee — any bookkeeping bug breaks it);
  3. recovery + agreement with MCMC posterior predictive;
  4. minibatch natural-gradient SVI convergence; fixed-K mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models
from common_tpu import state as st
from common_tpu.kernels import svi
from common_tpu.likelihoods import base as lik_base
from common_tpu.likelihoods import expfam


# ---------------------------------------------------------------------------
# exponential-family machinery
# ---------------------------------------------------------------------------
def _mc_expected_logpdf(lik, hyper_q, x, key, n=40000):
    """Monte Carlo E_q[log p(x|θ)] using sample_params at zero stats."""
    zero = lik.init_stats(hyper_q, (n,))
    # sample_params(key, hyper, stats=zeros) == n prior draws at hyper_q
    thetas = lik.sample_params(key, hyper_q, zero)
    lp = lik.logpdf(thetas, x)
    return float(jnp.mean(lp))


@pytest.mark.parametrize(
    "name,hyper_q,x",
    [
        ("bb", {"alpha": 3.0, "beta": 2.0}, 1.0),
        ("gp", {"alpha": 4.0, "inv_beta": 2.0}, 3),
        ("dd", {"alphas": np.array([2.0, 1.0, 4.0])}, 2),
        ("dm", {"alphas": np.array([2.0, 1.0, 4.0])}, np.array([1.0, 0.0, 3.0])),
        ("nich", {"mu": 0.5, "kappa": 2.0, "sigmasq": 1.5, "nu": 5.0}, 0.3),
        ("niw", {"mu0": np.zeros(2), "kappa": 2.0, "psi": np.eye(2) * 2.0,
                 "nu": 6.0}, np.array([0.4, -0.3])),
    ],
)
def test_expected_logpdf_matches_monte_carlo(name, hyper_q, x):
    lik = lik_base.get(name)
    hyper_q = {k: jnp.asarray(v, jnp.float32) for k, v in hyper_q.items()}
    x = jnp.asarray(x, jnp.float32)
    exact = float(expfam.expected_logpdf(lik, hyper_q, x, 1.0))
    mc = _mc_expected_logpdf(lik, hyper_q, x, jax.random.key(0))
    assert abs(exact - mc) < 0.03 * max(1.0, abs(exact)), (name, exact, mc)


def test_expfam_kl_beta_analytic():
    from scipy.stats import beta as spb
    lik = lik_base.get("bb")
    q = {"alpha": jnp.asarray(5.0), "beta": jnp.asarray(2.0)}
    p = {"alpha": jnp.asarray(1.0), "beta": jnp.asarray(1.0)}
    got = float(expfam.kl(lik, q, p))
    # quadrature truth
    xs = np.linspace(1e-6, 1 - 1e-6, 200001)
    qd = spb(5, 2).pdf(xs)
    pd = spb(1, 1).pdf(xs)
    truth = np.trapezoid(qd * (np.log(qd) - np.log(pd)), xs)
    assert abs(got - truth) < 1e-3, (got, truth)


def test_expfam_kl_gamma_analytic():
    lik = lik_base.get("gp")
    q = {"alpha": jnp.asarray(6.0), "inv_beta": jnp.asarray(3.0)}
    p = {"alpha": jnp.asarray(1.0), "inv_beta": jnp.asarray(1.0)}
    got = float(expfam.kl(lik, q, p))
    from scipy.special import digamma as dg, gammaln as gl
    a1, b1, a0, b0 = 6.0, 3.0, 1.0, 1.0
    truth = (
        (a1 - a0) * dg(a1) - gl(a1) + gl(a0)
        + a0 * (np.log(b1) - np.log(b0)) + a1 * (b0 - b1) / b1
    )
    assert abs(got - truth) < 1e-4, (got, truth)


def test_expfam_kl_niw_monte_carlo():
    lik = lik_base.get("niw")
    q = {"mu0": jnp.asarray([1.0, 0.0]), "kappa": jnp.asarray(4.0),
         "psi": jnp.asarray(np.eye(2) * 3.0, jnp.float32),
         "nu": jnp.asarray(7.0)}
    p = {"mu0": jnp.zeros(2), "kappa": jnp.asarray(1.0),
         "psi": jnp.asarray(np.eye(2), jnp.float32), "nu": jnp.asarray(4.0)}
    got = float(expfam.kl(lik, q, p))
    # MC: E_q[log q − log p] via prior_logpdf at sampled θ ~ q
    n = 60000
    zero = lik.init_stats(q, (n,))
    thetas = lik.sample_params(jax.random.key(1), q, zero)
    lq = lik.prior_logpdf(q, thetas)
    lp = lik.prior_logpdf(p, thetas)
    mc = float(jnp.mean(lq - lp))
    se = float(jnp.std(lq - lp)) / np.sqrt(n)
    assert abs(got - mc) < max(5 * se, 0.02), (got, mc, se)


# ---------------------------------------------------------------------------
# CAVI / SVI behavior
# ---------------------------------------------------------------------------
def _gaussian_problem(n=600, d=2, seed=0, k_max=12):
    r = np.random.default_rng(seed)
    centers = np.array([[-4.0, 0.0], [4.0, 0.0], [0.0, 5.0]])[:, :d]
    z = r.integers(0, 3, n)
    X = (centers[z] + r.normal(scale=0.6, size=(n, d))).astype(np.float32)
    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    data = ((jnp.asarray(X), jnp.ones(n)),)
    return defn, data, z


def test_cavi_elbo_monotone_and_recovers():
    defn, data, z = _gaussian_problem()
    post = svi.init(defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0})
    post, elbos = svi.fit_cavi(post, data, 60)
    elbos = np.asarray(elbos)
    assert np.isfinite(elbos).all()
    # monotone up to tiny float noise
    assert (np.diff(elbos) > -1e-2 * np.abs(elbos[1:])).all(), np.diff(elbos)

    hard = svi.to_state(post, data)
    zz = np.asarray(hard.assignments)
    co = zz[:, None] == zz[None, :]
    truth = z[:, None] == z[None, :]
    assert (co == truth).mean() > 0.95


def test_cavi_bb_elbo_monotone():
    n = 300
    r = np.random.default_rng(1)
    z = r.integers(0, 2, n)
    p_true = np.where(z == 0, 0.9, 0.1)
    x = (r.random(n) < p_true).astype(np.int64)
    defn = st.model_definition(n, [models.bb], k_max=8)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    post = svi.init(defn, data, jax.random.key(2), cluster_hp={"alpha": 1.0})
    post, elbos = svi.fit_cavi(post, data, 40)
    elbos = np.asarray(elbos)
    assert (np.diff(elbos) > -1e-2 * np.abs(elbos[1:])).all()


def test_cavi_bbv_elbo_monotone_and_recovers():
    """bbv rides the generic expfam SVI path (autodiff of its vector
    log-partition): ELBO monotone and planted binary blocks recovered."""
    n, d = 400, 8
    r = np.random.default_rng(4)
    z = r.integers(0, 2, n)
    probs = np.where(r.uniform(size=(2, d)) < 0.5, 0.1, 0.9)
    x = (r.uniform(size=(n, d)) < probs[z]).astype(np.float32)
    defn = st.model_definition(n, [models.bbv(d)], k_max=6)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    post = svi.init(defn, data, jax.random.key(2), cluster_hp={"alpha": 1.0})
    post, elbos = svi.fit_cavi(post, data, 40)
    elbos = np.asarray(elbos)
    assert (np.diff(elbos) > -1e-2 * np.abs(elbos[1:])).all()
    hard = svi.to_state(post, data)
    zz = np.asarray(hard.assignments)
    agree = ((zz[:, None] == zz[None, :]) == (z[:, None] == z[None, :])).mean()
    assert agree > 0.9, agree


def test_fixed_k_dirichlet_mode():
    defn, data, z = _gaussian_problem(k_max=3)
    post = svi.init(
        defn, data, jax.random.key(3),
        cluster_hp={"alphas": np.ones(3, np.float32)}, fixed=True,
    )
    post, elbos = svi.fit_cavi(post, data, 50)
    elbos = np.asarray(elbos)
    assert (np.diff(elbos) > -1e-2 * np.abs(elbos[1:])).all()
    hard = svi.to_state(post, data)
    assert int(hard.ngroups()) == 3


@pytest.mark.slow
def test_minibatch_svi_converges():
    defn, data, z = _gaussian_problem(n=5000, seed=4)
    # CAVI reference
    post_ref = svi.init(defn, data, jax.random.key(5), cluster_hp={"alpha": 1.0})
    post_ref, _ = svi.fit_cavi(post_ref, data, 40)
    elbo_ref = float(svi.elbo(post_ref, data))

    post = svi.init(defn, data, jax.random.key(6), cluster_hp={"alpha": 1.0})
    post, _ = svi.fit_svi(post, data, jax.random.key(7), 400, batch_size=512)
    elbo_svi = float(svi.elbo(post, data))
    # minibatch SVI should land near the CAVI optimum (per-row nats)
    assert (elbo_ref - elbo_svi) / defn.n < 0.25, (elbo_ref, elbo_svi)

    hard = svi.to_state(post, data)
    zz = np.asarray(hard.assignments)
    co = zz[:, None] == zz[None, :]
    truth = z[:, None] == z[None, :]
    assert (co == truth).mean() > 0.9


def test_svi_rejects_nonexpfam():
    defn = st.model_definition(4, [models.bbnc], k_max=2)
    data = ((jnp.zeros(4), jnp.ones(4)),)
    with pytest.raises(ValueError, match="exponential-family"):
        svi.init(defn, data, jax.random.key(0))


def test_predictive_logpdf_reasonable():
    defn, data, z = _gaussian_problem()
    post = svi.init(defn, data, jax.random.key(8), cluster_hp={"alpha": 1.0})
    post, _ = svi.fit_cavi(post, data, 40)
    # a point at a true center scores far higher than a far-away point
    # (the far point keeps heavy-tailed mass from the DP's empty-cluster
    # prior predictive, so the gap is ~15 nats, not unbounded)
    near = svi.predictive_logpdf(post, ((jnp.asarray([-4.0, 0.0]), 1.0),))
    far = svi.predictive_logpdf(post, ((jnp.asarray([50.0, 50.0]), 1.0),))
    assert float(near) > float(far) + 10.0
    assert float(near) > -4.0  # near-center density is genuinely high
