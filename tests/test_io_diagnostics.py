"""Checkpoint round-trip + bit-exact resume, and diagnostics sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from common_tpu import io as ctio
from common_tpu import models
from common_tpu import state as st
from common_tpu.runner import run_chain
from common_tpu.utils import diagnostics


def _problem(n=12, seed=0):
    r = np.random.default_rng(seed)
    defn = st.model_definition(n, [models.niw(2), models.bb], k_max=6)
    data = (
        (jnp.asarray(r.normal(size=(n, 2)), jnp.float32), jnp.ones(n)),
        (jnp.asarray(r.integers(0, 2, size=n)), jnp.ones(n)),
    )
    return defn, data


def test_checkpoint_roundtrip(tmp_path):
    defn, data = _problem()
    s = st.initialize(defn, data, jax.random.key(0), cluster_hp={"alpha": 1.3})
    key = jax.random.key(7)
    path = str(tmp_path / "ckpt.npz")
    ctio.save(path, s, extra={"key": key, "iter": jnp.asarray(42)})
    s2, extra = ctio.load(path)
    assert s2.lik_names == s.lik_names
    assert s2.fixed == s.fixed
    for a, b in zip(
        jax.tree_util.tree_leaves(s), jax.tree_util.tree_leaves(s2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(extra["iter"]) == 42
    np.testing.assert_array_equal(
        jax.random.key_data(extra["key"]), jax.random.key_data(key)
    )


def test_resume_is_bit_exact(tmp_path):
    """Running 2N sweeps == running N, checkpointing, resuming N more."""
    defn, data = _problem(seed=1)
    s0 = st.initialize(defn, data, jax.random.key(0), cluster_hp={"alpha": 1.0})
    key = jax.random.key(9)

    def sweeps(s, t0, n):
        for t in range(t0, t0 + n):
            s, _ = run_chain(s, data, jax.random.fold_in(key, t), 1, ["assign"])
        return s

    straight = sweeps(s0, 0, 6)

    half = sweeps(s0, 0, 3)
    blob = ctio.serialize(half, extra={"key": key, "iter": jnp.asarray(3)})
    restored, extra = ctio.deserialize(blob)
    resumed = sweeps(restored, int(extra["iter"]), 3)

    np.testing.assert_array_equal(
        np.asarray(straight.assignments), np.asarray(resumed.assignments)
    )
    np.testing.assert_allclose(
        np.asarray(straight.stats[0]["sum_x"]),
        np.asarray(resumed.stats[0]["sum_x"]),
        rtol=1e-6,
    )


def test_ess_iid_close_to_n():
    r = np.random.default_rng(0)
    x = r.normal(size=(4, 500)).astype(np.float32)
    e = float(diagnostics.ess(x))
    assert 1200 < e < 2800, e  # ~CT for iid


def test_ess_correlated_much_smaller():
    r = np.random.default_rng(1)
    t, rho = 1000, 0.95
    x = np.zeros((2, t), np.float32)
    for c in range(2):
        eps = r.normal(size=t)
        for i in range(1, t):
            x[c, i] = rho * x[c, i - 1] + eps[i]
    e = float(diagnostics.ess(x))
    # AR(1) tau ~ (1+rho)/(1-rho) = 39 -> ess ~ 2000/39 ~ 51
    assert e < 300, e


def test_rhat_mixed_vs_unmixed():
    r = np.random.default_rng(2)
    mixed = r.normal(size=(4, 400)).astype(np.float32)
    assert float(diagnostics.split_rhat(mixed)) < 1.05
    unmixed = mixed + np.arange(4)[:, None] * 5.0
    assert float(diagnostics.split_rhat(unmixed)) > 1.5


def test_summarize_traces():
    r = np.random.default_rng(3)
    out = diagnostics.summarize_traces(r.normal(size=(2, 300)))
    assert set(out) >= {"ess", "rhat", "mean", "std", "nchains", "nsamples"}
    assert out["nchains"] == 2 and out["nsamples"] == 300
