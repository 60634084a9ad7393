"""Pallas-fused linear-score cluster assignment.

Companion to ops/gaussian_assign.py for likelihoods whose [N, K] score
table is affine in the data row —

    z_n = argmax_k [ base_k + x_n · w_k + Gumbel_{nk} ]

which covers the vector Beta-Bernoulli (bbv: w_k = logit(p_k),
base_k = log mixture weight + Σ_d log(1−p_kd)) and any other
exponential-family model scored as ``X @ W.T + b`` (cf.
likelihoods/expfam.py's expected_loglik_table).  Same tiling story as the
Gaussian kernel: X is read from HBM exactly once (row tiles reused across
the inner cluster-tile grid axis), W streams in [K_TILE, D] blocks,
Gumbel noise comes from the on-core PRNG, and the running (max, argmax)
lives in VMEM scratch so the [N, K] table never exists in HBM.

Unlike the Gaussian kernel the whole cluster tile is scored with ONE
``X @ W_tile.T`` dot (no per-k unroll needed — there is no per-cluster
matrix operand), so the MXU sees a [tile_n, d] × [d, k_tile] matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from common_tpu.ops.gaussian_assign import _uniform_from_bits


def _linear_kernel(seed_ref, base_ref, x_ref, w_ref, z_ref,
                   best_ref, arg_ref):
    tile_n, d = x_ref.shape
    k_tile = w_ref.shape[0]
    j = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full((tile_n,), -jnp.inf, jnp.float32)
        arg_ref[:] = jnp.zeros((tile_n,), jnp.int32)

    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * num_k + j)
    bits = pltpu.bitcast(pltpu.prng_random_bits((tile_n, k_tile)), jnp.uint32)
    gumbel = -jnp.log(-jnp.log(_uniform_from_bits(bits)))

    scores = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tile_n, k_tile]
    for i in range(k_tile):
        lp = scores[:, i] + base_ref[j * k_tile + i] + gumbel[:, i]
        take = lp > best_ref[:]
        best_ref[:] = jnp.where(take, lp, best_ref[:])
        arg_ref[:] = jnp.where(take, j * k_tile + jnp.int32(i), arg_ref[:])

    @pl.when(j == num_k - 1)
    def _emit():
        z_ref[:, :] = arg_ref[:].reshape(tile_n // 128, 128)


@partial(jax.jit, static_argnames=("tile_n", "k_tile", "interpret"))
def fused_linear_assign(X, W, base, seed, tile_n: int = 1024,
                        k_tile: int = 8, interpret: bool = False):
    """Sample z_n ~ Cat(softmax_k(base_k + x_n · w_k)) for all rows.

    X [N, D] f32; W [K, D]; base [K]; seed int32.  Returns z [N] int32.
    tile_n must be a multiple of 1024 (int32 output retiling); K pads up
    to a multiple of k_tile with −inf base logits.
    """
    if tile_n % 1024:
        raise ValueError(f"tile_n must be a multiple of 1024, got {tile_n}")
    n, d = X.shape
    k = W.shape[0]
    k_tile = min(k_tile, k)
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))
    k_pad = -(-k // k_tile) * k_tile
    if k_pad != k:
        W = jnp.pad(W, ((0, k_pad - k), (0, 0)))
        base = jnp.pad(base, (0, k_pad - k), constant_values=-jnp.inf)

    grid = (n_pad // tile_n, k_pad // k_tile)
    z = pl.pallas_call(
        _linear_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, d), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_tile, d), lambda i, j, *_: (j, 0),
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
        jnp.asarray(W, jnp.float32),
    )
    return z.reshape(n_pad)[:n]


@jax.jit
def linear_assign_reference(X, W, base, key):
    """XLA reference of the same sampler (tests + CPU fallback)."""
    logp = X @ W.T + base[None, :]
    g = jax.random.gumbel(key, logp.shape, logp.dtype)
    return jnp.argmax(logp + g, axis=-1).astype(jnp.int32)
