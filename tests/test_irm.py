"""IRM tests: enumeration oracles for self- and bipartite relations
(collapsed + blocked kernels), invariants, missing cells, block recovery."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as sp_logsumexp

from common_tpu import models, testutil
from common_tpu import relational as irm
from common_tpu.data.sparse import sparse_ndarray_dataview


def _exact_self_posterior(defn, views, alpha):
    """Exact posterior over partitions of the single domain."""
    key = jax.random.key(0)
    parts, scores = [], []
    for part in testutil.permutation_iter(defn.domain_sizes[0]):
        s = irm.initialize(
            defn, views, key,
            cluster_hps=[{"alpha": alpha}],
            domain_assignments=[np.asarray(part, np.int32)],
        )
        parts.append(part)
        scores.append(float(irm.score_joint(s)))
    probs = np.exp(scores - sp_logsumexp(scores))
    return dict(zip(parts, probs))


def _self_problem(n=4, seed=0, k_max=5):
    r = np.random.default_rng(seed)
    rel = (r.random((n, n)) < 0.5).astype(np.float32)
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=k_max)
    views = [sparse_ndarray_dataview(dense=rel)]
    return defn, views


def _chain_partitions(defn, views, alpha, kernel, nsweeps, seed, burnin=100):
    s = irm.initialize(
        defn, views, jax.random.key(seed + 50),
        cluster_hps=[{"alpha": alpha}] * defn.ndomains,
    )
    views_t = irm.as_views(views)

    out = []
    if kernel == "collapsed":
        @jax.jit
        def chain(s, key):
            def body(st, k):
                st = irm.kernels._assign_jit(st, views_t, k, 0)
                return st, st.assignments[0]
            return jax.lax.scan(body, s, jax.random.split(key, nsweeps + burnin))
    else:
        self_rel = tuple(
            irm.kernels._self_relational(s, d) for d in range(s.ndomains)
        )

        @jax.jit
        def chain(s, key):
            def body(st, k):
                st = irm.kernels._sweep_jit(st, views_t, k, self_rel)
                return st, st.assignments[0]
            return jax.lax.scan(body, s, jax.random.split(key, nsweeps + burnin))

    _, trace = chain(s, jax.random.key(seed))
    for a in np.asarray(trace)[burnin:]:
        out.append(testutil.permutation_canonical(a))
    return out


@pytest.mark.parametrize("kernel", ["collapsed", "blocked"])
def test_self_relation_matches_enumeration(kernel):
    defn, views = _self_problem(n=4)
    alpha = 1.2
    exact = _exact_self_posterior(defn, views, alpha)
    cache = {}

    def sample_fn(n):
        if n not in cache:
            cache[n] = _chain_partitions(
                defn, views, alpha, kernel, n, seed=len(cache)
            )
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_bipartite_matches_enumeration():
    """2-domain relation: joint posterior over (partition, partition)."""
    n1, n2 = 3, 3
    r = np.random.default_rng(1)
    rel = (r.random((n1, n2)) < 0.5).astype(np.float32)
    defn = irm.model_definition([n1, n2], [((0, 1), models.bb)], k_max=4)
    views = [sparse_ndarray_dataview(dense=rel)]
    alpha = 1.0
    key = jax.random.key(0)

    combos, scores = [], []
    for p1 in testutil.permutation_iter(n1):
        for p2 in testutil.permutation_iter(n2):
            s = irm.initialize(
                defn, views, key,
                cluster_hps=[{"alpha": alpha}, {"alpha": alpha}],
                domain_assignments=[np.asarray(p1, np.int32),
                                    np.asarray(p2, np.int32)],
            )
            combos.append((p1, p2))
            scores.append(float(irm.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    views_t = irm.as_views(views)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n",))
    def chain(s, key, n):
        def body(st, k):
            st = irm.kernels._assign_jit(st, views_t, jax.random.fold_in(k, 0), 0)
            st = irm.kernels._assign_jit(st, views_t, jax.random.fold_in(k, 1), 1)
            return st, (st.assignments[0], st.assignments[1])
        return jax.lax.scan(body, s, jax.random.split(key, n))

    cache = {}

    def sample_fn(n):
        if n not in cache:
            s = irm.initialize(
                defn, views, jax.random.key(len(cache) + 7),
                cluster_hps=[{"alpha": alpha}, {"alpha": alpha}],
            )
            _, (t1, t2) = chain(s, jax.random.key(len(cache)), n + 100)
            cache[n] = [
                (testutil.permutation_canonical(a1),
                 testutil.permutation_canonical(a2))
                for a1, a2 in zip(np.asarray(t1)[100:], np.asarray(t2)[100:])
            ]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_counts_and_stats_invariants():
    defn, views = _self_problem(n=6, seed=2, k_max=4)
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    views_t = irm.as_views(views)
    for i in range(5):
        s = irm.kernels.assign(s, views_t, jax.random.key(i), domain=0)
    assert int(jnp.sum(s.counts[0])) == 6
    # suffstats: total cell count preserved (36 observed cells)
    assert np.isclose(float(jnp.sum(s.suffstats[0]["n"])), 36.0, atol=1e-3)
    # score finite
    assert np.isfinite(float(irm.score_joint(s)))


def test_missing_cells_excluded():
    n = 5
    r = np.random.default_rng(3)
    rel = (r.random((n, n)) < 0.5).astype(np.float32)
    missing = r.random((n, n)) < 0.3
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=4)
    view = sparse_ndarray_dataview(dense=rel, missing_mask=missing)
    s = irm.initialize(defn, [view], jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    expected = float((~missing).sum())
    assert np.isclose(float(jnp.sum(s.suffstats[0]["n"])), expected)
    s = irm.kernels.assign(s, [view], jax.random.key(1))
    assert np.isclose(float(jnp.sum(s.suffstats[0]["n"])), expected, atol=1e-3)


@pytest.mark.slow
def test_block_structure_recovery_blocked_kernel():
    """60x60 binary relation with 3x3 block structure: blocked sweeps
    recover the row/column co-clustering."""
    n, kb = 60, 3
    r = np.random.default_rng(4)
    zr = np.repeat(np.arange(kb), n // kb)
    zc = np.repeat(np.arange(kb), n // kb)
    eta = np.full((kb, kb), 0.1)
    np.fill_diagonal(eta, 0.85)
    eta[0, 2] = 0.6  # asymmetric off-block so columns are identifiable too
    probs = eta[zr[:, None], zc[None, :]]
    rel = (r.random((n, n)) < probs).astype(np.float32)

    defn = irm.model_definition([n, n], [((0, 1), models.bb)], k_max=10)
    views = [sparse_ndarray_dataview(dense=rel)]
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}, {"alpha": 1.0}])
    views_t = irm.as_views(views)
    self_rel = (False, False)

    @jax.jit
    def run(s, key):
        def body(st, k):
            return irm.kernels._sweep_jit(st, views_t, k, self_rel), None
        s, _ = jax.lax.scan(body, s, jax.random.split(key, 150))
        return s

    s = run(s, jax.random.key(1))
    zhat = np.asarray(s.assignments[0])
    co = zhat[:, None] == zhat[None, :]
    truth = zr[:, None] == zr[None, :]
    assert (co == truth).mean() > 0.95, (co == truth).mean()


def test_domain_alpha_ew_matches_quadrature():
    """Stationary dist of the per-domain EW alpha kernel == quadrature."""
    from scipy.special import gammaln as sgammaln

    n, kplus = 30, 6
    a, b = 1.5, 0.5
    assignment = np.repeat(np.arange(kplus), n // kplus)
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=8)
    r = np.random.default_rng(0)
    views = [sparse_ndarray_dataview(
        dense=(r.random((n, n)) < 0.5).astype(np.float32))]
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}],
                       domain_assignments=[np.asarray(assignment, np.int32)])

    @jax.jit
    def chain(s, key):
        def body(st, k):
            st = irm.kernels.domain_alpha_escobar_west(st, k, 1.5, 0.5)
            return st, st.cluster_hps[0]["alpha"]

        return jax.lax.scan(body, s, jax.random.split(key, 6000))[1]

    alphas = np.asarray(chain(s, jax.random.key(1)))[1000:]

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


def test_domain_alpha_grid_concentrates():
    """Grid kernel draws concentrate near the EPPF-posterior mode."""
    from common_tpu import scalar_functions as sf

    n, kplus = 30, 6
    assignment = np.repeat(np.arange(kplus), n // kplus)
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=8)
    r = np.random.default_rng(0)
    views = [sparse_ndarray_dataview(
        dense=(r.random((n, n)) < 0.5).astype(np.float32))]
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}],
                       domain_assignments=[np.asarray(assignment, np.int32)])
    grid = np.geomspace(0.05, 40, 60).astype(np.float32)
    draws = []
    for i in range(200):
        s2 = irm.kernels.domain_alpha_grid(
            s, sf.log_exponential(0.5), grid, jax.random.key(i)
        )
        draws.append(float(s2.cluster_hps[0]["alpha"]))
    m = np.mean(draws)
    assert 0.5 < m < 8.0, m  # quadrature mean of the EW test is ~2.4


def test_sharded_sweep_matches_enumeration(cpu_devices):
    """Cell-sharded blocked sweep on the virtual 8-device mesh samples the
    exact joint (partition, partition) posterior of a bipartite relation."""
    from common_tpu import parallel

    n1, n2 = 3, 3
    r = np.random.default_rng(1)
    rel = (r.random((n1, n2)) < 0.5).astype(np.float32)
    defn = irm.model_definition([n1, n2], [((0, 1), models.bb)], k_max=4)
    views = [sparse_ndarray_dataview(dense=rel)]
    alpha = 1.0
    key = jax.random.key(0)

    combos, scores = [], []
    for p1 in testutil.permutation_iter(n1):
        for p2 in testutil.permutation_iter(n2):
            s = irm.initialize(
                defn, views, key,
                cluster_hps=[{"alpha": alpha}, {"alpha": alpha}],
                domain_assignments=[np.asarray(p1, np.int32),
                                    np.asarray(p2, np.int32)],
            )
            combos.append((p1, p2))
            scores.append(float(irm.score_joint(s)))
    exact = dict(zip(combos, np.exp(scores - sp_logsumexp(scores))))

    mesh = parallel.make_mesh(chains=1, data=8, devices=cpu_devices[:8])
    cache = {}

    def sample_fn(n):
        if n not in cache:
            with jax.default_device(cpu_devices[0]):
                s = irm.initialize(
                    defn, views, jax.random.key(len(cache) + 7),
                    cluster_hps=[{"alpha": alpha}, {"alpha": alpha}],
                )
                sviews = irm.kernels.shard_cells(mesh, views)
                sweep = irm.kernels.make_sharded_sweep(mesh, s, sviews)

                from functools import partial as _partial

                @_partial(jax.jit, static_argnames=("steps",))
                def chain(s, key, steps):
                    def body(st, k):
                        st = sweep(st, sviews, k)
                        return st, (st.assignments[0], st.assignments[1])

                    return jax.lax.scan(body, s, jax.random.split(key, steps))

                _, (t1, t2) = chain(s, jax.random.key(len(cache)), n + 100)
            cache[n] = [
                (testutil.permutation_canonical(a1),
                 testutil.permutation_canonical(a2))
                for a1, a2 in zip(np.asarray(t1)[100:], np.asarray(t2)[100:])
            ]
        return cache[n]

    testutil.assert_discrete_dist_approx(
        sample_fn, exact, nsamples=3000, ntries=3, kl_tol=0.05
    )


def test_sharded_sweep_rejects_self_relations(cpu_devices):
    from common_tpu import parallel

    defn, views = _self_problem(n=4)
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    mesh = parallel.make_mesh(chains=1, data=8, devices=cpu_devices[:8])
    sviews = irm.kernels.shard_cells(mesh, views)
    with pytest.raises(ValueError, match="self-relation"):
        irm.kernels.make_sharded_sweep(mesh, s, sviews)


def test_irm_runner_integration():
    """runner() drives IRMState through a kernel config (reference runner
    parity for the irm repo)."""
    from common_tpu.runner import runner

    n = 24
    r = np.random.default_rng(7)
    zr = np.repeat(np.arange(2), n // 2)
    probs = np.where(zr[:, None] == zr[None, :], 0.85, 0.1)
    rel = (r.random((n, n)) < probs).astype(np.float32)
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=6)
    views = irm.as_views([sparse_ndarray_dataview(dense=rel)])
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    run = runner(defn, views, s,
                 [("assign", {}), ("ew_domain_alpha", {"a": 1.0, "b": 1.0})])
    out = run.run(jax.random.key(1), 30)
    assert np.isfinite(run.score_trace).all()
    # co-clustering recovered (many-to-one): rows in the same true block
    # should co-occur in the trace's final assignment
    z = np.asarray(out.assignments[0])
    same = z[:, None] == z[None, :]
    truth = zr[:, None] == zr[None, :]
    assert (same == truth).mean() > 0.9
    assert float(out.cluster_hps[0]["alpha"]) > 0


def test_pred_logpdf_matches_hand_computation():
    """Cell predictive == BB posterior-predictive of its block."""
    defn, views = _self_problem(n=6, seed=5, k_max=4)
    s = irm.initialize(defn, views, jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    idx = np.array([[0, 3], [2, 5], [4, 4]], np.int32)
    vals = np.array([1.0, 0.0, 1.0], np.float32)
    got = np.asarray(irm.pred_logpdf(s, 0, idx, vals))

    z = np.asarray(s.assignments[0])
    heads = np.asarray(s.suffstats[0]["heads"])
    n = np.asarray(s.suffstats[0]["n"])
    a, b = 1.0, 1.0  # bb default hyper
    for m, (i, j) in enumerate(idx):
        h, tot = heads[z[i], z[j]], n[z[i], z[j]]
        p1 = (a + h) / (a + b + tot)
        want = np.log(p1 if vals[m] == 1.0 else 1.0 - p1)
        assert abs(got[m] - want) < 1e-4, (m, got[m], want)


def test_link_prediction_recovers_block_structure():
    """Held-out cells of a 2-block relation predicted with high AUC-style
    accuracy after collapsed sweeps."""
    n = 20
    r = np.random.default_rng(11)
    zr = np.repeat(np.arange(2), n // 2)
    probs = np.where(zr[:, None] == zr[None, :], 0.9, 0.1)
    rel = (r.random((n, n)) < probs).astype(np.float32)
    missing = r.random((n, n)) < 0.15
    defn = irm.model_definition([n], [((0, 0), models.bb)], k_max=6)
    view = sparse_ndarray_dataview(dense=rel, missing_mask=missing)
    s = irm.initialize(defn, [view], jax.random.key(0),
                       cluster_hps=[{"alpha": 1.0}])
    for i in range(15):
        s = irm.kernels.assign(s, [view], jax.random.key(i))
    held = np.argwhere(missing)
    p = np.asarray(irm.predict_missing(s, 0, held.astype(np.int32), (0.0, 1.0)))
    pred = p[:, 1] > 0.5
    truth_p = probs[held[:, 0], held[:, 1]] > 0.5
    acc = (pred == truth_p).mean()
    assert acc > 0.85, acc
