"""Split-merge (Jain–Neal) kernel: exact-enumeration validation.

The sharpest check available: PURE split-merge is ergodic on partitions
(any state can merge down and re-split), so its equilibrium must match
the exact posterior with no help from single-site sweeps — any error in
the MH correction (proposal density, EPPF delta, marginal-lik delta,
slot bookkeeping) shows up directly.  A mixed assign+split-merge chain
is validated too (the production usage pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models
from common_tpu import state as st
from common_tpu.kernels import splitmerge
from tests.test_gibbs_exact import (
    _bb_problem,
    _niw_problem,
    check,
)


def test_pure_splitmerge_bb_matches_enumeration():
    defn, data = _bb_problem(n=4, k_max=5)
    check(defn, data, {"alpha": 1.2},
          [("split_merge", {"n_moves": 2, "t_scans": 2})])


def test_mixed_assign_splitmerge_niw_matches_enumeration():
    defn, data = _niw_problem(n=4, k_max=5)
    check(defn, data, {"alpha": 0.8},
          [("assign", {}), ("split_merge", {"n_moves": 1, "t_scans": 2})])


def test_splitmerge_invariants_medium():
    """Structural invariants at a non-trivial size: counts match
    assignments, suffstats match a from-scratch restat, empty slots stay
    exactly zero, and moves actually accept (both directions occur)."""
    n, d, K = 400, 3, 8
    r = np.random.default_rng(0)
    centers = r.normal(scale=4.0, size=(3, d))
    zt = r.integers(0, 3, size=n)
    x = (centers[zt] + r.normal(size=(n, d))).astype(np.float32)
    defn = st.model_definition(n, [models.niw(d)], k_max=K)
    data = ((jnp.asarray(x), jnp.ones(n)),)
    s = st.initialize(defn, data, jax.random.key(0),
                      cluster_hp={"alpha": 1.0})
    lik = s.likelihoods()[0]

    k_actives = []
    for it in range(30):
        s = splitmerge.move(s, data, jax.random.key(it), t_scans=2)
        k_actives.append(int((np.asarray(s.counts) > 0).sum()))
    z = np.asarray(s.assignments)
    counts = np.asarray(s.counts)
    np.testing.assert_array_equal(counts, np.bincount(z, minlength=K))
    sref = lik.stats_from_assignments(
        s.hypers[0], data[0][0], data[0][1], jnp.asarray(z), K
    )
    for leaf in ("n", "sum_x", "sum_xxT"):
        np.testing.assert_allclose(
            np.asarray(s.stats[0][leaf]), np.asarray(sref[leaf]),
            rtol=1e-3, atol=1e-2,
        )
    # empty slots: exact zeros (the merge zero-clear + split restat)
    for leaf in ("n", "sum_x", "sum_xxT"):
        arr = np.asarray(s.stats[0][leaf])
        assert (np.abs(arr[counts == 0]) == 0.0).all()
    # the chain moved (some accepted proposals changed k_active)
    assert len(set(k_actives)) > 1, k_actives


def test_splitmerge_rejects_fixed_and_nonconjugate():
    n = 6
    defn = st.model_definition(n, [models.bb], k_max=3)
    data = ((jnp.zeros(n), jnp.ones(n)),)
    s = st.initialize(defn, data, jax.random.key(0),
                      cluster_hp={"alphas": np.full(3, 1.0, np.float32)},
                      fixed=True)
    with pytest.raises(ValueError, match="non-fixed"):
        splitmerge.move(s, data, jax.random.key(1))

    defn2 = st.model_definition(n, [models.bbnc], k_max=4)
    s2 = st.initialize(defn2, data, jax.random.key(0),
                       cluster_hp={"alpha": 1.0})
    with pytest.raises(ValueError, match="conjugate"):
        splitmerge.move(s2, data, jax.random.key(1))
