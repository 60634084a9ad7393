"""Pallas-fused Gaussian cluster assignment (the blocked-Gibbs hot op).

No reference analog (the reference's hot loop is scalar C++ virtual
dispatch, SURVEY.md §3.2); this is the SURVEY §7 step-8 Pallas fusion of
the TPU perf path's inner op:

    z_n = argmax_k [ base_k − ½‖(x_n − μ_k) B_kᵀ‖² + Gumbel_{nk} ]

i.e. per-row categorical sampling over K Gaussian clusters.  The XLA
version scans clusters, re-reading X from HBM once per cluster and
materializing [N, K] score + Gumbel tables — at 1M×256, K=64 that is
~64 GB of X re-reads plus ~512 MB of table traffic per sweep.  This
kernel tiles rows into VMEM **and tiles clusters**, so:

  - X is read from HBM exactly once (the row-tile block is reused across
    the inner cluster-tile grid dimension — Pallas skips the DMA when the
    block index does not change);
  - `binv` streams through VMEM in [K_TILE, D, D] blocks (the whole
    [K, D, D] tensor never has to fit — 16.8 MB at K=64, D=256 exceeds
    a v5e core's VMEM, the round-1 limitation flagged in VERDICT.md);
  - Gumbel noise comes from the on-core PRNG (seeded per (row-tile,
    cluster-tile) so every tile pair gets an independent stream);
  - the running (max, argmax) lives in VMEM scratch, carried across
    cluster tiles; z is written once on the last cluster tile.

HBM traffic ≈ read X once + write z once — speed-of-light for this op.

Inputs (precomputed in XLA from the likelihood's posterior draws):
  X     [N, D]     rows
  mu    [K, D]     cluster means
  binv  [K, D, D]  B_k = L_k^{-1} with L_k = chol(Σ_k): ‖(x−μ)Bᵀ‖² is the
                   Mahalanobis quadratic form
  base  [K]        log w_k − ½ log|Σ_k| − d/2 log 2π  (+ any extra logits)
  seed  int32      per-sweep PRNG seed (each tile folds in its grid ids)

Returns z [N] int32.  `interpret=True` runs the same kernel through the
Pallas interpreter for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_from_bits(bits):
    """uint32 → float32 uniform in [2^-24, 1): mantissa-fill trick."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-7)


def _assign_kernel(seed_ref, base_ref, x_ref, mu_ref, binv_ref, z_ref,
                   best_ref, arg_ref):
    tile_n, d = x_ref.shape
    k_tile = mu_ref.shape[0]
    j = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full((tile_n,), -jnp.inf, jnp.float32)
        arg_ref[:] = jnp.zeros((tile_n,), jnp.int32)

    # one combined stream id per (row-tile, cluster-tile); Mosaic's
    # prng_seed takes at most 2 values
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * num_k + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits((tile_n, k_tile)), jnp.uint32)
    gumbel = -jnp.log(-jnp.log(_uniform_from_bits(bits)))

    x = x_ref[:]
    best = best_ref[:]
    arg = arg_ref[:]

    # k_tile is static: unroll so every ref/array index is constant (the
    # Pallas TPU lowering has no dynamic_slice on register arrays)
    for i in range(k_tile):
        dev = x - mu_ref[i, :]
        y = jax.lax.dot_general(
            dev, binv_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile_n, d] · B_kᵀ
        quad = jnp.sum(y * y, axis=-1)
        lp = base_ref[j * k_tile + i] - 0.5 * quad + gumbel[:, i]
        take = lp > best
        best = jnp.where(take, lp, best)
        arg = jnp.where(take, j * k_tile + jnp.int32(i), arg)
    best_ref[:] = best
    arg_ref[:] = arg

    @pl.when(j == num_k - 1)
    def _emit():
        z_ref[:, :] = arg_ref[:].reshape(tile_n // 128, 128)


@partial(jax.jit, static_argnames=("tile_n", "k_tile", "interpret"))
def fused_gaussian_assign(X, mu, binv, base, seed, tile_n: int = 1024,
                          k_tile: int = 8, interpret: bool = False):
    """Sample z_n ~ Cat(softmax_k(base_k − ½ Mahalanobis²)) for all rows.

    tile_n must be a multiple of 1024 (the int32 output retiles to
    [rows of 128] with 8-sublane blocks).  K is padded up to a multiple
    of k_tile with −inf base logits (never selected).
    """
    if tile_n % 1024:
        raise ValueError(f"tile_n must be a multiple of 1024, got {tile_n}")
    n, d = X.shape
    k = mu.shape[0]
    k_tile = min(k_tile, k)
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))
    k_pad = -(-k // k_tile) * k_tile
    if k_pad != k:
        mu = jnp.pad(mu, ((0, k_pad - k), (0, 0)))
        binv = jnp.pad(
            binv, ((0, k_pad - k), (0, 0), (0, 0)), constant_values=0.0
        )
        base = jnp.pad(base, (0, k_pad - k), constant_values=-jnp.inf)

    grid = (n_pad // tile_n, k_pad // k_tile)
    z = pl.pallas_call(
        _assign_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # (seed, base) ride SMEM scalar prefetch: base is tiny [K] and
            # rank-1 VMEM blocks can't tile below 128 lanes
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, d), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_tile, d), lambda i, j, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_tile, d, d), lambda i, j, *_: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n // 128, 128),
                                   lambda i, j, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile_n,), jnp.float32),
                pltpu.VMEM((tile_n,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray(base, jnp.float32),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(binv, jnp.float32),
    )
    return z.reshape(n_pad)[:n]


# ---------------------------------------------------------------------------
# multi-chain variant: per-(row, chain) argmax over each chain's K slots
# ---------------------------------------------------------------------------
def _assign_chains_kernel(tiles_per_chain, seed_ref, base_ref, x_ref,
                          mu_ref, binv_ref, z_ref, best_ref, arg_ref):
    """Grid (row tiles, C*K/k_tile cluster tiles, chain-major).

    Identical math to `_assign_kernel`, but the running (max, argmax)
    resets at each chain's FIRST cluster tile and the z column for chain
    c is emitted at its LAST — cluster tiles never straddle chains
    (k_tile divides K), so the scratch is one [tile_n] pair.
    """
    tile_n, d = x_ref.shape
    k_tile = mu_ref.shape[0]
    j = pl.program_id(1)
    num_k = pl.num_programs(1)
    jj = j % tiles_per_chain  # tile index within this chain

    @pl.when(jj == 0)
    def _init():
        best_ref[:] = jnp.full((tile_n,), -jnp.inf, jnp.float32)
        arg_ref[:] = jnp.zeros((tile_n,), jnp.int32)

    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * num_k + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits((tile_n, k_tile)), jnp.uint32)
    gumbel = -jnp.log(-jnp.log(_uniform_from_bits(bits)))

    x = x_ref[:]
    best = best_ref[:]
    arg = arg_ref[:]
    k_base = jj * k_tile  # within-chain slot id of this tile's first slot
    for i in range(k_tile):
        dev = x - mu_ref[i, :]
        y = jax.lax.dot_general(
            dev, binv_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        quad = jnp.sum(y * y, axis=-1)
        lp = base_ref[j * k_tile + i] - 0.5 * quad + gumbel[:, i]
        take = lp > best
        best = jnp.where(take, lp, best)
        arg = jnp.where(take, k_base + jnp.int32(i), arg)
    best_ref[:] = best
    arg_ref[:] = arg

    @pl.when(jj == tiles_per_chain - 1)
    def _emit():
        z_ref[0, :, :] = arg_ref[:].reshape(tile_n // 128, 128)


@partial(jax.jit, static_argnames=("n_chains", "tile_n", "k_tile",
                                   "interpret"))
def fused_gaussian_assign_chains(X, mu, binv, base, seed, n_chains: int,
                                 tile_n: int = 1024, k_tile: int = 8,
                                 interpret: bool = False):
    """Per-chain categorical draws for C chains sharing one X: z [C, N].

    mu [C*K, D], binv [C*K, D, D], base [C*K] are chain-major flattened
    (chain c owns slots [c*K, (c+1)*K)); the argmax for each row is taken
    independently within each chain's slot range, with independent
    on-core Gumbel noise per (row-tile, cluster-tile).  X streams from
    HBM once for ALL chains — the multi-chain analog of
    `fused_gaussian_assign`, removing the [N, C, K] logp/Gumbel/argmax
    HBM passes that cap `blocked.sweep_chains` scaling (BENCH_NOTES.md
    round 4 "Chain scaling": the W ≈ 0.15-0.2 ms/chain elementwise term).
    """
    if tile_n % 1024:
        raise ValueError(f"tile_n must be a multiple of 1024, got {tile_n}")
    n, d = X.shape
    ck = mu.shape[0]
    if ck % n_chains:
        raise ValueError(f"mu rows {ck} must be n_chains*K, C={n_chains}")
    k = ck // n_chains
    # Mosaic requires the cluster-tile (sublane) dim divisible by 8 when
    # the block is a strict slice of the [C*K, D] array — so k_tile is
    # 8-aligned and each chain's K pads up to a multiple of it with -inf
    # base logits (never selected).
    k_tile = max(8, min(k_tile, -(-k // 8) * 8) // 8 * 8)
    k_pad = -(-k // k_tile) * k_tile
    if k_pad != k:
        mu = mu.reshape(n_chains, k, d)
        mu = jnp.pad(mu, ((0, 0), (0, k_pad - k), (0, 0))).reshape(-1, d)
        binv = binv.reshape(n_chains, k, d, d)
        binv = jnp.pad(
            binv, ((0, 0), (0, k_pad - k), (0, 0), (0, 0))
        ).reshape(-1, d, d)
        base = jnp.pad(
            base.reshape(n_chains, k), ((0, 0), (0, k_pad - k)),
            constant_values=-jnp.inf,
        ).reshape(-1)
        ck = n_chains * k_pad
    tiles_per_chain = k_pad // k_tile
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // tile_n, ck // k_tile)
    z = pl.pallas_call(
        partial(_assign_chains_kernel, tiles_per_chain),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, d), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_tile, d), lambda i, j, *_: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_tile, d, d), lambda i, j, *_: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_n // 128, 128),
                lambda i, j, *_, tpc=tiles_per_chain: (j // tpc, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tile_n,), jnp.float32),
                pltpu.VMEM((tile_n,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_chains, n_pad // 128, 128), jnp.int32
        ),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray(base, jnp.float32),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(binv, jnp.float32),
    )
    return z.reshape(n_chains, n_pad)[:, :n]


@jax.jit
def gaussian_assign_reference(X, mu, binv, base, key):
    """XLA reference of the same sampler (tests + CPU fallback): builds
    the [N, K] score table via a scan of per-cluster matmuls (peak memory
    [N, D] + [N, K], like niw.logpdf_batch) and draws Gumbel via
    jax.random."""

    def per_cluster(_, mb):
        mu_k, binv_k, base_k = mb
        y = (X - mu_k) @ binv_k.T
        return None, base_k - 0.5 * jnp.sum(y * y, axis=-1)

    _, cols = jax.lax.scan(per_cluster, None, (mu, binv, base))  # [K, N]
    logp = cols.T
    g = jax.random.gumbel(key, logp.shape, logp.dtype)
    return jnp.argmax(logp + g, axis=-1).astype(jnp.int32)
