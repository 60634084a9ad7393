"""Multi-chip blocked-Gibbs training step (shard_map over a (chains, data) mesh).

The multi-chip rebuild target of SURVEY.md §2.3: rows sharded over the
`data` axis, chains over the `chains` axis; per-sweep communication is a
single `psum` of the (small) per-cluster suffstat pytree + counts over
`data` — everything else is local.  θ draws and stick weights are computed
redundantly on every data shard from identical (replicated) global stats
with identical per-chain keys, so they agree bitwise without any broadcast.

Per-sweep comm volume per chain = O(K · suffstat) (e.g. K=64, NIW-256:
64·(1+256+256²)·4B ≈ 17 MB psum) — independent of N, which is what makes
row scaling efficient over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from common_tpu.kernels import blocked
from common_tpu.parallel import mesh as mesh_mod
from common_tpu.parallel.mesh import CHAINS, DATA
from common_tpu.state import MixtureState


def _local_sweep(state_c: MixtureState, data_blk, key_chain, data_idx):
    """One chain's sweep on one data shard; returns psum-reduced state."""
    thetas, logw, loglik_table = blocked.sweep_parts(state_c, data_blk, key_chain)
    logp = logw[None, :] + loglik_table(data_blk)  # [N_local, K]

    kz = jax.random.fold_in(jax.random.fold_in(key_chain, 2), data_idx)
    g = jax.random.gumbel(kz, logp.shape, logp.dtype)
    z = jnp.argmax(logp + g, axis=-1).astype(jnp.int32)

    K = state_c.k_max
    counts_local = jax.ops.segment_sum(
        jnp.ones_like(z), z, num_segments=K
    ).astype(jnp.int32)
    counts = jax.lax.psum(counts_local, DATA)

    new_stats = []
    for f, ((x, mask), lik, hyper) in enumerate(
        zip(data_blk, state_c.likelihoods(), state_c.hypers)
    ):
        s_local = lik.stats_from_assignments(hyper, x, mask, z, K)
        s = jax.tree_util.tree_map(lambda t: jax.lax.psum(t, DATA), s_local)
        if lik.latent_leaves:
            s = {
                k: (thetas[f][k] if k in lik.latent_leaves else s[k])
                for k in s
            }
        new_stats.append(s)

    return dataclasses.replace(
        state_c, assignments=z, counts=counts, stats=tuple(new_stats)
    )


def make_sharded_sweep(mesh: Mesh, state_batched: MixtureState, data):
    """Build a jitted multi-chip sweep: (state [C,...], data, key) -> state.

    state_batched: chain-batched state (leading axis C on every leaf,
    assignments [C, N]).  Returns a function already bound to the mesh
    sharding layout of `mesh_mod.state_pspec`/`data_pspec`.
    """
    sspec = mesh_mod.state_pspec(state_batched)
    dspec = mesh_mod.data_pspec(data)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(sspec, dspec, P()),
        out_specs=sspec,
    )
    def sweep(state_blk, data_blk, key):
        c_shard = jax.lax.axis_index(CHAINS)
        d_idx = jax.lax.axis_index(DATA)
        c_local = state_blk.counts.shape[0]

        def one_chain(st, i):
            gci = c_shard * c_local + i
            k_chain = jax.random.fold_in(key, gci)
            return _local_sweep(st, data_blk, k_chain, d_idx)

        return jax.vmap(one_chain)(state_blk, jnp.arange(c_local))

    return sweep


def initialize_chains(defn, data, keys, **kwargs) -> MixtureState:
    """C independent chain states stacked on a leading axis (vmap of init)."""
    from common_tpu import state as state_mod

    return jax.vmap(
        lambda k: state_mod.initialize(defn, data, k, **kwargs)
    )(keys)


def gather_chain(state_batched: MixtureState, i: int) -> MixtureState:
    """Host-side: extract chain i as an unbatched state."""
    return jax.tree_util.tree_map(lambda l: l[i], state_batched)
