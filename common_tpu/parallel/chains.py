"""Family-generic chain parallelism (vmap over a leading chain axis).

The reference ecosystem's only parallelism is independent multi-chain via
multiprocessing (SURVEY.md §2.3); here chains are a `vmap` axis on the
state pytree — one compiled program advances C chains at once on-chip,
and the chain axis maps onto the mesh's 'chains' axis across chips
(parallel/sharded.py does this for mixtures end-to-end).

These helpers work for ANY state family (MixtureState, HDPState,
IRMState are all pytrees):

  stack_states([s1, s2, ...])  -> chain-batched state (leading axis C)
  unstack_state(batched, i)    -> chain i as an unbatched state
  vmap_sweep(sweep_fn)         -> (batched_state, data, keys[C]) -> batched

Initialization stays host-side per chain (some initializers do host work,
e.g. HDP's CRT cap) — build each chain with its own key, then stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_states(states):
    """List of identically-shaped state pytrees -> one chain-batched state."""
    if not states:
        raise ValueError("stack_states needs at least one state")
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *states
    )


def unstack_state(batched, i: int):
    """Chain i of a chain-batched state (host-side gather)."""
    return jax.tree_util.tree_map(lambda l: l[i], batched)


def vmap_sweep(sweep_fn):
    """Lift sweep(state, data, key) over a leading chain axis.

    Data is shared (broadcast); each chain gets its own key from a [C]
    key array: vmapped = vmap_sweep(topic.blocked_sweep);
    batched = vmapped(batched, data, jax.random.split(key, C)).
    """
    return jax.vmap(sweep_fn, in_axes=(0, None, 0))
