"""Cross-sampler posterior agreement at BASELINE config-1 style scale.

The north star asks for posterior quantities that "match the reference
within MC error" (BASELINE.md).  The reference itself cannot run here, so
the strongest available check is *internal cross-validation*: three
independently-implemented samplers targeting (essentially) the same
posterior — exact collapsed Gibbs (CRP), blocked truncated stick-breaking
Gibbs, and block-SMC — must agree on posterior summaries at a scale where
enumeration is impossible.  Each pair shares no sampling code beyond the
likelihood's suffstat math, so agreement is strong evidence all three
are correct (and the small-n enumeration batteries pin them exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from common_tpu import models, state as st
from common_tpu.kernels import blocked, gibbs, smc


def _problem(n=1200, seed=0, n_held=200):
    """Moderately separated 2-D Gaussians: non-trivial co-assignment
    posterior (boundary rows genuinely ambiguous).  Also returns `n_held`
    extra rows from the SAME mixture for held-out predictive checks."""
    r = np.random.default_rng(seed)
    centers = np.array([[-2.2, 0.0], [2.2, 0.0], [0.0, 2.8]])
    zt = r.integers(0, 3, n + n_held)
    X = (
        centers[zt] + r.normal(scale=1.0, size=(n + n_held, 2))
    ).astype(np.float32)
    defn = st.model_definition(n, [models.niw(2)], k_max=16)
    data = ((jnp.asarray(X[:n]), jnp.ones(n)),)
    held = ((jnp.asarray(X[n:]), jnp.ones(n_held)),)
    return defn, data, zt[:n], held


def _mean_coassign(assignment_trace):
    """Mean co-assignment probability matrix over sampled partitions."""
    zs = np.asarray(assignment_trace)
    co = np.zeros((zs.shape[1], zs.shape[1]))
    for z in zs:
        co += z[:, None] == z[None, :]
    return co / len(zs)


@pytest.mark.slow
def test_collapsed_blocked_smc_agree_config1_scale():
    defn, data, zt, held = _problem(n=600)
    n = defn.n
    chp = {"alpha": 1.0}
    burn, keep = 80, 300

    # collapsed CRP Gibbs
    s = st.initialize(defn, data, jax.random.key(0), cluster_hp=chp)

    @jax.jit
    def collapsed_chain(s, key):
        def body(state, k):
            state = gibbs.assign_resample(state, data, k)
            return state, state.assignments

        return jax.lax.scan(body, s, jax.random.split(key, burn + keep))

    s_c, trace_c = collapsed_chain(s, jax.random.key(1))
    co_c = _mean_coassign(np.asarray(trace_c)[burn:])

    # blocked truncated stick-breaking Gibbs
    s = st.initialize(defn, data, jax.random.key(2), cluster_hp=chp)

    @jax.jit
    def blocked_chain(s, key):
        def body(state, k):
            state = blocked.sweep(state, data, k)
            return state, state.assignments

        return jax.lax.scan(body, s, jax.random.split(key, burn + keep))

    s_b, trace_b = blocked_chain(s, jax.random.key(3))
    co_b = _mean_coassign(np.asarray(trace_b)[burn:])

    # block-SMC: weighted co-assignment over final particles.
    # rejuvenation_blocks matters here: with the default 1, ancestry
    # degeneracy leaves the final cloud nearly degenerate (measured
    # d_cs ~ 0.23); at 6 the cloud matches the Gibbs posterior
    # (dose-response measured 1 -> 0.23, 4 -> 0.035, 8 -> 0.015).
    parts = smc.init_particles(defn, data, jax.random.key(4), 512,
                               cluster_hp=chp)
    res = smc.run_blocked(parts, data, jax.random.key(5), block=64,
                          rejuvenation_blocks=6)
    asg, w = smc.posterior_partition_weights(res)
    asg, w = np.asarray(asg), np.asarray(w)
    co_s = np.zeros((n, n))
    for a, wi in zip(asg, w):
        co_s += wi * (a[:, None] == a[None, :])

    # pairwise mean absolute difference of co-assignment probabilities;
    # bounds ~2x the MC error at these sample sizes
    d_cb = np.abs(co_c - co_b).mean()
    d_cs = np.abs(co_c - co_s).mean()
    assert d_cb < 0.06, d_cb
    assert d_cs < 0.06, d_cs

    # all three broadly recover the planted structure (sanity floor —
    # boundary rows are genuinely ambiguous at this separation, so the
    # correct posterior does NOT match the truth matrix perfectly)
    truth = zt[:, None] == zt[None, :]
    for co in (co_c, co_b, co_s):
        assert (((co > 0.5) == truth).mean()) > 0.89

    # held-out predictive agreement — the BASELINE-named quality metric
    # ("predictive log-likelihood within MC error"): mean log posterior-
    # predictive density of 200 same-mixture rows must agree across the
    # three independently-implemented samplers.  (Measured round 4: a
    # single posterior state's mean heldout logp varies by <0.01 across
    # chains at this scale, so 0.1 is ~10x the MC noise.)
    lp_c = float(np.mean(np.asarray(st.heldout_logp(s_c, held))))
    lp_b = float(np.mean(np.asarray(st.heldout_logp(s_b, held))))
    # SMC: proper particle-cloud predictive, logsumexp over particles
    from jax.scipy.special import logsumexp as _lse

    lw = jnp.log(jnp.asarray(w + 1e-30))
    lp_rows = jax.vmap(
        lambda i: st.heldout_logp(
            jax.tree_util.tree_map(lambda l: l[i], res.particles), held
        )
    )(jnp.arange(asg.shape[0]))                     # [P, H]
    lp_s = float(jnp.mean(_lse(lw[:, None] + lp_rows, axis=0)))
    assert abs(lp_c - lp_b) < 0.1, (lp_c, lp_b)
    assert abs(lp_c - lp_s) < 0.1, (lp_c, lp_s)
