"""Blocked (uncollapsed, truncated stick-breaking) Gibbs tests.

Validated against the same exact-enumeration oracle as the collapsed
kernel: for K_max ≫ E[K⁺] the truncated-DP partition posterior is
indistinguishable from the exact DP posterior at test tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models, testutil
from common_tpu import state as st
from common_tpu.kernels import blocked
from common_tpu.runner import run_chain

from test_gibbs_exact import exact_partition_posterior, sampled_partitions


def test_stick_break_weights_normalize():
    key = jax.random.key(0)
    counts = jnp.asarray([5, 3, 0, 2, 0, 0, 0, 0], jnp.int32)
    logw = blocked.stick_break_log_weights(key, counts, jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.exp(jax.scipy.special.logsumexp(logw)), 1.0, rtol=1e-5
    )
    # populous sticks get (stochastically) larger weights: check expectation
    # via many draws
    many = jax.vmap(
        lambda k: blocked.stick_break_log_weights(k, counts, jnp.asarray(1.0))
    )(jax.random.split(key, 512))
    mean_w = np.mean(np.exp(np.asarray(many)), axis=0)
    assert mean_w[0] > mean_w[1] > mean_w[3]


def test_restat_matches_compute_stats():
    r = np.random.default_rng(0)
    n = 20
    defn = st.model_definition(n, [models.niw(2), models.bb], k_max=6)
    data = (
        (jnp.asarray(r.normal(size=(n, 2)), jnp.float32), jnp.ones(n)),
        (jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),
    )
    s = st.initialize(defn, data, jax.random.key(0))
    z = jnp.asarray(r.integers(0, 6, size=n), jnp.int32)
    s2 = blocked.restat(s, data, z)
    scratch = st.compute_stats(defn, s.hypers, data, z)
    for f in range(2):
        for k in s2.stats[f]:
            np.testing.assert_allclose(
                np.asarray(s2.stats[f][k]),
                np.asarray(scratch[f][k]),
                rtol=1e-4, atol=1e-4,
            )


def test_niw_matmul_stats_match_generic():
    """NIW's matmul stats path == the generic vmap/segment path."""
    from common_tpu.likelihoods import base as lb
    from common_tpu.likelihoods import niw as niw_lik  # registry instance

    r = np.random.default_rng(1)
    n, d, K = 50, 3, 5
    X = jnp.asarray(r.normal(size=(n, d)), jnp.float32)
    mask = jnp.asarray(r.integers(0, 2, size=n), jnp.float32)
    gid = jnp.asarray(r.integers(0, K + 1, size=n), jnp.int32)  # K = dropped
    hyper = models.niw(d).canonical_hyper()
    fast = niw_lik.stats_from_assignments(hyper, X, mask, gid, K)
    generic = lb.Likelihood.stats_from_assignments(
        niw_lik, hyper, X, mask, gid, K
    )
    for k in fast:
        np.testing.assert_allclose(
            np.asarray(fast[k]), np.asarray(generic[k]), rtol=1e-4, atol=1e-4
        )


@pytest.mark.slow
def test_blocked_gibbs_bb_matches_enumeration():
    r = np.random.default_rng(0)
    n = 4
    defn = st.model_definition(n, [models.bb], k_max=16)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    chp = {"alpha": 1.0}
    exact = exact_partition_posterior(
        st.model_definition(n, [models.bb], k_max=5), data, chp
    )
    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            cache[nsweeps] = sampled_partitions(
                defn, data, chp, ["assign_blocked"], nsweeps,
                burnin=300, seed=len(cache),
            )
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=6000, ntries=3, kl_tol=0.03
    )


@pytest.mark.slow
def test_blocked_gibbs_bbv_matches_enumeration():
    """bbv (vector Beta-Bernoulli) through the blocked sweep vs the
    exact-enumeration oracle — the crown-jewel gate for the new model."""
    r = np.random.default_rng(2)
    n, d = 4, 3
    defn = st.model_definition(n, [models.bbv(d)], k_max=16)
    x = jnp.asarray(r.integers(0, 2, size=(n, d)).astype(np.float32))
    data = ((x, jnp.ones(n)),)
    chp = {"alpha": 1.0}
    exact = exact_partition_posterior(
        st.model_definition(n, [models.bbv(d)], k_max=5), data, chp
    )
    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            cache[nsweeps] = sampled_partitions(
                defn, data, chp, ["assign_blocked"], nsweeps,
                burnin=300, seed=len(cache),
            )
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=6000, ntries=3, kl_tol=0.03
    )


def test_blocked_gibbs_niw_matches_enumeration():
    r = np.random.default_rng(2)
    n = 4
    defn = st.model_definition(n, [models.niw(2)], k_max=16)
    data = ((jnp.asarray(r.normal(size=(n, 2)), jnp.float32), jnp.ones(n)),)
    chp = {"alpha": 1.5}
    exact = exact_partition_posterior(
        st.model_definition(n, [models.niw(2)], k_max=5), data, chp
    )
    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            cache[nsweeps] = sampled_partitions(
                defn, data, chp, ["assign_blocked"], nsweeps,
                burnin=300, seed=len(cache),
            )
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=6000, ntries=3, kl_tol=0.03
    )


@pytest.mark.slow
def test_blocked_fixed_k_matches_enumeration():
    import itertools

    r = np.random.default_rng(6)
    n, K = 4, 3
    defn = st.model_definition(n, [models.bb], k_max=K)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    alphas = np.array([0.8, 1.0, 1.2], np.float32)
    chp = {"alphas": alphas}
    assignments = list(itertools.product(range(K), repeat=n))
    scores = []
    for a in assignments:
        s = st.initialize(
            defn, data, jax.random.key(0), cluster_hp=chp,
            assignment=jnp.asarray(a, jnp.int32), fixed=True,
        )
        scores.append(float(st.score_joint(s)))
    exact = dict(zip(assignments, testutil.scores_to_probs(scores)))

    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            s0 = st.initialize(
                defn, data, jax.random.key(50), cluster_hp=chp, fixed=True
            )
            _, trace = run_chain(
                s0, data, jax.random.key(7), nsweeps + 300, ["assign_blocked"]
            )
            cache[nsweeps] = [
                tuple(a) for a in np.asarray(trace["assignments"])[300:].tolist()
            ]
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=6000, ntries=3, kl_tol=0.03
    )


def test_blocked_recovers_clusters_quickly():
    """Mixing sanity on real synthetic structure (30 sweeps, 2000 rows)."""
    r = np.random.default_rng(0)
    centers = np.array([[-5.0, 0.0], [5.0, 0.0], [0.0, 6.0]])
    tz = r.integers(0, 3, 2000)
    X = centers[tz] + r.normal(scale=0.5, size=(2000, 2))
    defn = st.model_definition(2000, [models.niw(2)], k_max=32)
    data = ((jnp.asarray(X, jnp.float32), jnp.ones(2000)),)
    s = st.initialize(defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0})
    fs, trace = run_chain(s, data, jax.random.key(1), 30, ["assign_blocked"])
    z = np.asarray(fs.assignments)
    # dominant 3 clusters hold ~all rows
    cnt = np.sort(np.bincount(z, minlength=32))[::-1]
    assert cnt[:3].sum() > 1950
    # co-assignment agreement
    co_true = tz[:, None] == tz[None, :]
    co_pred = z[:, None] == z[None, :]
    assert (co_true == co_pred).mean() > 0.98


# ---------------------------------------------------------------------------
# multi-chain sweep (sweep_chains): wide-matmul chain batching
# ---------------------------------------------------------------------------
def _stacked_states(defn, data, C, seed, alpha=1.0):
    return jax.vmap(
        lambda k: st.initialize(defn, data, k, cluster_hp={"alpha": alpha})
    )(jax.random.split(jax.random.key(seed), C))


def test_chain_score_table_matches_per_chain():
    """The expanded-quadratic [N, C, K] table == per-chain logpdf_batch,
    and sample_params_prec is the SAME posterior draw as sample_params
    (identical key layout -> identical mu, prec = (L Lᵀ)⁻¹)."""
    r = np.random.default_rng(0)
    n, d, K, C = 300, 4, 8, 3
    X = jnp.asarray(r.normal(scale=3.0, size=(n, d)), jnp.float32)
    defn = st.model_definition(n, [models.niw(d)], k_max=K)
    data = ((X, jnp.ones(n, jnp.float32)),)
    states = _stacked_states(defn, data, C, 0)
    lik = states.likelihoods()[0]
    keys = jax.random.split(jax.random.key(7), C)
    thetas = jax.vmap(lik.sample_params)(
        keys, states.hypers[0], states.stats[0]
    )
    thetas_p = jax.vmap(lik.sample_params_prec)(
        keys, states.hypers[0], states.stats[0]
    )
    # same draw: identical mu; prec inverts the covariance; logdet agrees
    np.testing.assert_allclose(
        np.asarray(thetas_p["mu"]), np.asarray(thetas["mu"]),
        rtol=1e-4, atol=1e-4,
    )
    chol = np.asarray(thetas["cov_chol"], np.float64)
    sigma = chol @ np.swapaxes(chol, -1, -2)
    np.testing.assert_allclose(
        np.asarray(thetas_p["prec"], np.float64) @ sigma,
        np.broadcast_to(np.eye(d), sigma.shape),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(thetas_p["logdet"]),
        2.0 * np.log(np.diagonal(chol, axis1=-2, axis2=-1)).sum(-1),
        rtol=1e-4, atol=1e-4,
    )

    logw = jax.vmap(blocked.stick_break_log_weights)(
        jax.random.split(jax.random.key(9), C), states.counts,
        states.cluster_hp["alpha"].astype(jnp.float32),
    )
    table = blocked._chain_score_table(
        thetas_p["mu"], thetas_p["prec"], thetas_p["logdet"], logw, X
    )
    for c in range(C):
        th_c = jax.tree_util.tree_map(lambda l: l[c], thetas)
        ref = lik.logpdf_batch(th_c, X, jnp.ones(n)) + logw[c][None, :]
        np.testing.assert_allclose(
            np.asarray(table[:, c, :]), np.asarray(ref),
            rtol=2e-4, atol=2e-3,
        )


def test_sweep_chains_restat_and_masking():
    r = np.random.default_rng(1)
    n, d, K, C = 200, 3, 6, 2
    X = jnp.asarray(r.normal(size=(n, d)), jnp.float32)
    defn = st.model_definition(n, [models.niw(d)], k_max=K)
    data = ((X, jnp.ones(n, jnp.float32)),)
    states = _stacked_states(defn, data, C, 1)
    out = jax.jit(blocked.sweep_chains)(states, data, jax.random.key(3))
    lik = states.likelihoods()[0]
    z = np.asarray(out.assignments)
    assert z.shape == (C, n)
    for c in range(C):
        np.testing.assert_array_equal(
            np.asarray(out.counts[c]), np.bincount(z[c], minlength=K)
        )
        hyp_c = {k: v[c] for k, v in states.hypers[0].items()}
        sref = lik.stats_from_assignments(
            hyp_c, X, jnp.ones(n), jnp.asarray(z[c]), K
        )
        for leaf in ("n", "sum_x", "sum_xxT"):
            np.testing.assert_allclose(
                np.asarray(out.stats[0][leaf][c]), np.asarray(sref[leaf]),
                rtol=1e-3, atol=1e-2,
            )
    # fully-masked data: stats stay exactly zero, prior-weight assignment
    data0 = ((X, jnp.zeros(n, jnp.float32)),)
    out0 = jax.jit(blocked.sweep_chains)(states, data0, jax.random.key(3))
    assert float(jnp.abs(out0.stats[0]["sum_x"]).sum()) == 0.0
    assert float(jnp.abs(out0.stats[0]["sum_xxT"]).sum()) == 0.0
    # non-niw models take the vmapped-sweep fallback and still work
    defb = st.model_definition(n, [models.bb], k_max=K)
    B = jnp.asarray(r.integers(0, 2, size=n), jnp.float32)
    datab = ((B, jnp.ones(n, jnp.float32)),)
    sb = _stacked_states(defb, datab, C, 2)
    outb = jax.jit(blocked.sweep_chains)(sb, datab, jax.random.key(4))
    assert outb.counts.shape == (C, K)
    np.testing.assert_array_equal(np.asarray(outb.counts).sum(-1), n)


def test_sweep_chains_matches_enumeration():
    """Each chain of sweep_chains is a correct blocked-Gibbs sampler:
    pooled chain samples match the exact partition posterior."""
    r = np.random.default_rng(2)
    n, C = 4, 4
    defn = st.model_definition(n, [models.niw(2)], k_max=16)
    data = ((jnp.asarray(r.normal(size=(n, 2)), jnp.float32), jnp.ones(n)),)
    chp = {"alpha": 1.5}
    exact = exact_partition_posterior(
        st.model_definition(n, [models.niw(2)], k_max=5), data, chp
    )
    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            per_chain = -(-nsweeps // C) + 300
            states = _stacked_states(defn, data, C, 40 + len(cache),
                                     alpha=1.5)

            @jax.jit
            def run(states, key):
                def body(ss, t):
                    ss = blocked.sweep_chains(
                        ss, data, jax.random.fold_in(key, t)
                    )
                    return ss, ss.assignments

                return jax.lax.scan(
                    body, states, jnp.arange(per_chain)
                )[1]

            za = np.asarray(run(states, jax.random.key(len(cache))))
            za = za[300:].reshape(-1, n)
            cache[nsweeps] = [
                testutil.permutation_canonical(a) for a in za
            ]
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=6000, ntries=3, kl_tol=0.03
    )
