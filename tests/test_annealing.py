"""Subsample annealing (kernels/annealing.py) — bookkeeping + exactness.

The annealed chain must (a) seat every row with intact CRP/suffstat
bookkeeping and (b) once all rows are active, reduce to a random-scan
collapsed Gibbs sampler whose stationary distribution is the exact
posterior (checked against the enumeration oracle, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models, testutil
from common_tpu import state as st
from common_tpu.kernels import annealing

from tests.test_gibbs_exact import check, exact_partition_posterior


def _nich_problem(n, seed=0, k_max=8):
    r = np.random.default_rng(seed)
    x = np.concatenate(
        [r.normal(-3, 0.5, n // 2), r.normal(3, 0.5, n - n // 2)]
    )
    defn = st.model_definition(n, [models.nich], k_max=k_max)
    data = ((jnp.asarray(x, jnp.float32), jnp.ones(n)),)
    return defn, data, (x < 0).astype(int)


def test_anneal_activates_all_rows_with_intact_bookkeeping():
    n = 60
    defn, data, _ = _nich_problem(n, seed=1)
    s0 = annealing.empty_state(
        defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0}
    )
    assert int(jnp.sum(s0.counts)) == 0
    n_steps, add, res = annealing.linear_schedule(n, add_per_step=7,
                                                  resample_per_step=5)
    s = annealing.run(s0, data, jax.random.key(1), n_steps,
                      add_per_step=add, resample_per_step=res)
    z = np.asarray(s.assignments)
    assert (z >= 0).all()
    # counts must equal a from-scratch recount of the assignment vector
    recount = np.bincount(z, minlength=defn.k_max)
    np.testing.assert_array_equal(np.asarray(s.counts), recount)
    # suffstats must equal a from-scratch recompute (no drift/corruption)
    fresh = st.compute_stats(defn, s.hypers, data, s.assignments)
    for got, want in zip(s.stats, fresh):
        for leaf_g, leaf_w in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_g), np.asarray(leaf_w), rtol=1e-4, atol=1e-4
            )
    assert jnp.isfinite(st.score_joint(s))


def test_anneal_recovers_two_clusters():
    n = 200
    defn, data, truth = _nich_problem(n, seed=2)
    s0 = annealing.empty_state(
        defn, data, jax.random.key(3), cluster_hp={"alpha": 1.0}
    )
    n_steps, add, res = annealing.linear_schedule(n, add_per_step=8,
                                                  resample_per_step=8)
    # +60 post-activation steps: once every row is seated, each step is
    # add+res = 16 uniform random-scan updates, so this is ~5 effective
    # full sweeps of burn-in after the anneal reaches the full posterior.
    s = annealing.run(s0, data, jax.random.key(4), n_steps + 60,
                      add_per_step=add, resample_per_step=res)
    z = np.asarray(s.assignments)
    # dominant cluster on each side of the separation must differ
    left = np.bincount(z[truth == 1]).argmax()
    right = np.bincount(z[truth == 0]).argmax()
    assert left != right
    # purity: every cluster's rows come from one side (robust to the
    # benign oversplitting a single posterior draw can show)
    purity = sum(
        max((truth[z == k] == 1).sum(), (truth[z == k] == 0).sum())
        for k in np.unique(z)
    ) / n
    assert purity > 0.95, purity


def test_anneal_respects_prefix_initialization():
    """Rows assigned in the initial state count as active; the rest seat."""
    n = 24
    defn, data, _ = _nich_problem(n, seed=5)
    half = np.full(n, -1, np.int32)
    half[: n // 2] = np.arange(n // 2) % 3
    s0 = st.initialize(
        defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0},
        assignment=jnp.asarray(half),
    )
    s = annealing.run(s0, data, jax.random.key(1), n_steps=n // 2,
                      add_per_step=1, resample_per_step=0)
    assert (np.asarray(s.assignments) >= 0).all()
    assert int(jnp.sum(s.counts)) == n


@pytest.mark.slow
def test_anneal_then_gibbs_matches_enumeration():
    """Annealed start + systematic sweeps target the exact posterior."""
    r = np.random.default_rng(7)
    n = 4
    defn = st.model_definition(n, [models.bb], k_max=5)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    check(defn, data, {"alpha": 1.5}, ["assign"])


@pytest.mark.slow
def test_random_scan_resample_matches_enumeration():
    """Fully-active annealing steps = random-scan collapsed Gibbs: the
    per-call kernel (masked no-op removes + traced-bound randint targets)
    must leave the exact posterior invariant."""
    r = np.random.default_rng(8)
    n = 4
    defn = st.model_definition(n, [models.bb], k_max=5)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    chp = {"alpha": 1.5}
    exact = exact_partition_posterior(defn, data, chp)

    cache = {}

    def sample_fn(nsamples):
        if nsamples not in cache:
            s = st.initialize(defn, data, jax.random.key(60), cluster_hp=chp)
            key = jax.random.key(9 + len(cache))
            out = []
            for t in range(nsamples + 100):
                s = annealing.run(
                    s, data, jax.random.fold_in(key, t),
                    n_steps=2, add_per_step=1, resample_per_step=3,
                )
                if t >= 100:
                    out.append(
                        testutil.permutation_canonical(
                            np.asarray(s.assignments)
                        )
                    )
            cache[nsamples] = out
        return cache[nsamples]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=2500, ntries=3, kl_tol=0.02
    )
