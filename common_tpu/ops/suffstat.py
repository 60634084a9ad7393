"""Pallas-fused NIW scatter-matrix rebuild (the blocked-Gibbs restat op).

No reference analog (the reference updates suffstats row-at-a-time in C++,
SURVEY.md §3.2); this fuses the rebuild half of the TPU blocked sweep:

    sum_xxT[k] = Σ_{n: z_n = k} x_n x_nᵀ         [K, D, D]

The XLA path (niw.stats_from_assignments) scans clusters with one
(X · w_k)ᵀ @ X matmul per cluster, so X streams from HBM K times — at the
1M×256, K=64 headline that is ~64 GB of reads per sweep.  This kernel
makes the cluster-tile dimension the OUTER grid axis and row tiles the
inner one, so the [K_TILE, D, D] output block stays resident in VMEM
across the whole row sweep (accumulated in place, flushed once per
cluster tile): X streams exactly K/K_TILE times (8 GB at K_TILE=8) and
the FLOPs are the same MXU matmuls.

counts and sum_x stay in XLA — they are O(N·D) and fused into the
surrounding program for free; only the O(N·K·D²) scatter matrix is worth
a kernel.

TPU numerics: the MXU's DEFAULT f32 matmul is a single-pass bf16 op
(~0.4% input truncation, measured on v5e).  For this accumulation that is
statistically benign — per-value truncation errors average down with
cluster size (~1e-4 relative at 256 rows/cluster, ~0.03 nat on the NIW
posterior logdet at D=256).  `precision="highest"` opts into the f32x3
emulation (~2× slower, needs k_tile ≤ 8 at D=256 for VMEM scratch).

Inputs:
  X [N, D] f32    rows
  z [N] int32     cluster assignment per row (values in [0, K))
Returns sum_xxT [K, D, D] f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_restat_kernel(precision):
    def _restat_kernel(z_ref, x_ref, out_ref):
        tile_n, d = x_ref.shape
        k_tile = out_ref.shape[0]
        i = pl.program_id(1)   # row tile (inner: output stays resident)
        j = pl.program_id(0)   # cluster tile (outer)

        @pl.when(i == 0)
        def _zero():
            out_ref[:, :, :] = jnp.zeros((k_tile, d, d), jnp.float32)

        x = x_ref[:]
        z = z_ref[:].reshape(tile_n)

        # k_tile is static: unroll so every ref index is constant
        for k in range(k_tile):
            w = (z == j * k_tile + k).astype(jnp.float32)
            xw = x * w[:, None]
            t = jax.lax.dot_general(
                xw, x,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [d, d] = xwᵀ @ x
            out_ref[k, :, :] += t

    return _restat_kernel


@partial(jax.jit, static_argnames=("k", "tile_n", "k_tile", "interpret",
                                   "precision"))
def fused_scatter_stats(X, z, k: int, tile_n: int = 1024, k_tile: int = 8,
                        interpret: bool = False, precision=None):
    """sum_xxT [k, D, D] from (X, z) with X streamed k/k_tile times.

    Rows with z outside [0, k) (e.g. masked rows routed to a scratch id)
    contribute nothing.  N is padded to a tile_n multiple with zero rows
    assigned to cluster k (never matched).  precision: None (fast MXU
    default — see module numerics note) or "highest" (f32x3 emulation).
    """
    if tile_n % 128:
        raise ValueError(f"tile_n must be a multiple of 128, got {tile_n}")
    n, d = X.shape
    k_tile = min(k_tile, k)
    k_pad = -(-k // k_tile) * k_tile
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))
        z = jnp.pad(z, (0, n_pad - n), constant_values=k_pad)
    z2 = jnp.asarray(z, jnp.int32).reshape(n_pad // 128, 128)

    grid = (k_pad // k_tile, n_pad // tile_n)
    out = pl.pallas_call(
        _make_restat_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n // 128, 128), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_tile, d, d), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, d, d), jnp.float32),
        interpret=interpret,
    )(z2, jnp.asarray(X, jnp.float32))
    return out[:k]
