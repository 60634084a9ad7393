"""The crown-jewel correctness battery: exact-posterior enumeration vs MCMC.

Methodology rebuilt from the reference (SURVEY.md §4): enumerate all set
partitions of n≤5 entities, compute the exact posterior by brute force
(score_joint over every partition), run the sampler for thousands of
sweeps, bin sampled canonical partitions, and assert KL(exact ‖ sampled)
is small with escalating sample counts.  This catches CRP-bookkeeping bugs
(wrong EPPF corner cases, stale suffstats, wrong birth proposals) that
moment checks miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models, testutil
from common_tpu import state as st
from common_tpu.runner import run_chain

KEY = jax.random.key(0)


def exact_partition_posterior(defn, data, cluster_hp, fixed=False):
    def score_fn(part):
        s = st.initialize(
            defn, data, KEY,
            cluster_hp=cluster_hp,
            assignment=jnp.asarray(part, jnp.int32),
            fixed=fixed,
        )
        return float(st.score_joint(s))

    parts, probs = testutil.dist_on_all_clusterings(score_fn, defn.n)
    return dict(zip(parts, probs))


def sampled_partitions(defn, data, cluster_hp, config, nsweeps, burnin=100,
                       fixed=False, seed=1):
    s = st.initialize(
        defn, data, jax.random.key(seed + 100),
        cluster_hp=cluster_hp, fixed=fixed,
    )
    _, trace = run_chain(
        s, data, jax.random.key(seed), nsweeps + burnin, config
    )
    samples = np.asarray(trace["assignments"])[burnin:]
    return [testutil.permutation_canonical(a) for a in samples]


def check(defn, data, cluster_hp, config, fixed=False, nsweeps=3000):
    exact = exact_partition_posterior(defn, data, cluster_hp, fixed=fixed)
    cache = {}

    def sample_fn(n):
        if n not in cache:
            cache[n] = sampled_partitions(
                defn, data, cluster_hp, config, n, fixed=fixed, seed=len(cache)
            )
        return cache[n]

    return testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=nsweeps, ntries=3, kl_tol=0.02
    )


def _bb_problem(n=4, k_max=5, seed=0):
    r = np.random.default_rng(seed)
    defn = st.model_definition(n, [models.bb], k_max=k_max)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    return defn, data


def _nich_problem(n=4, k_max=5, seed=0):
    r = np.random.default_rng(seed)
    defn = st.model_definition(n, [models.nich], k_max=k_max)
    x = np.concatenate([r.normal(-2, 0.5, n // 2), r.normal(2, 0.5, n - n // 2)])
    data = ((jnp.asarray(x, jnp.float32), jnp.ones(n)),)
    return defn, data


def _niw_problem(n=4, k_max=5, seed=0):
    r = np.random.default_rng(seed)
    defn = st.model_definition(n, [models.niw(2)], k_max=k_max)
    data = ((jnp.asarray(r.normal(size=(n, 2)), jnp.float32), jnp.ones(n)),)
    return defn, data


def test_collapsed_gibbs_bb_matches_enumeration():
    # NOT slow-marked: the fast gate keeps one enumeration oracle per
    # sampler (round-4; the remaining model variants stay in the slow tier)
    defn, data = _bb_problem()
    check(defn, data, {"alpha": 1.5}, ["assign"])


@pytest.mark.slow
def test_collapsed_gibbs_nich_matches_enumeration():
    defn, data = _nich_problem()
    check(defn, data, {"alpha": 1.0}, ["assign"])


@pytest.mark.slow
def test_collapsed_gibbs_niw_matches_enumeration():
    defn, data = _niw_problem()
    check(defn, data, {"alpha": 2.0}, ["assign"])


@pytest.mark.slow
def test_collapsed_gibbs_mixed_features_matches_enumeration():
    r = np.random.default_rng(3)
    n = 4
    defn = st.model_definition(n, [models.bb, models.nich], k_max=5)
    data = (
        (jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),
        (jnp.asarray(r.normal(size=n), jnp.float32), jnp.ones(n)),
    )
    check(defn, data, {"alpha": 1.0}, ["assign"])


def test_neal8_m2_conjugate_matches_enumeration():
    # NOT slow-marked: see test_collapsed_gibbs_bb_matches_enumeration
    """Neal-8 with m=2 aux groups must target the same posterior."""
    defn, data = _bb_problem(seed=5)
    check(defn, data, {"alpha": 1.5}, [("assign_resample", {"m": 2})])


@pytest.mark.slow
def test_neal8_bbnc_nonconjugate_matches_enumeration():
    """Non-conjugate bbnc via Neal-8 + exact theta conditionals.

    The exact target is the *analytically collapsed* posterior (bbnc is
    bb with p explicit), so the oracle scores partitions with the bb
    marginal; the sampler never uses it.
    """
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
                [("assign_resample", {"m": 3}), ("theta", {})],
                nsweeps, seed=len(cache),
            )
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=4000, ntries=3, kl_tol=0.03
    )


@pytest.mark.slow
def test_fixed_k_gibbs_matches_enumeration():
    """Fixed-K Dirichlet state: enumeration over *labelled* assignments."""
    r = np.random.default_rng(6)
    n, K = 4, 3
    defn = st.model_definition(n, [models.bb], k_max=K)
    data = ((jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),)
    alphas = np.array([0.8, 1.0, 1.2], np.float32)
    chp = {"alphas": alphas}

    # enumerate all K^n labelled assignments (labels matter when alphas differ)
    import itertools

    assignments = list(itertools.product(range(K), repeat=n))
    scores = []
    for a in assignments:
        s = st.initialize(
            defn, data, KEY, cluster_hp=chp,
            assignment=jnp.asarray(a, jnp.int32), fixed=True,
        )
        scores.append(float(st.score_joint(s)))
    probs = testutil.scores_to_probs(scores)
    exact = dict(zip(assignments, probs))

    cache = {}

    def sample_fn(nsweeps):
        if nsweeps not in cache:
            s0 = st.initialize(
                defn, data, jax.random.key(50), cluster_hp=chp, fixed=True
            )
            _, trace = run_chain(
                s0, data, jax.random.key(7), nsweeps + 100, ["assign_fixed"]
            )
            cache[nsweeps] = [
                tuple(a) for a in np.asarray(trace["assignments"])[100:].tolist()
            ]
        return cache[nsweeps]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.02
    )
