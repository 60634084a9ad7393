"""Pallas-fused Gaussian cluster assignment (the blocked-Gibbs hot op).

No reference analog (the reference's hot loop is scalar C++ virtual
dispatch, SURVEY.md §3.2); this is the SURVEY §7 step-8 Pallas fusion of
the TPU perf path's inner op:

    z_n = argmax_k [ base_k − ½‖(x_n − μ_k) B_kᵀ‖² + Gumbel_{nk} ]

i.e. per-row categorical sampling over K Gaussian clusters.  The XLA
version materializes the [N, K] score table (plus a [N, K] Gumbel tensor)
in HBM — at 1M×64 that is ~512 MB of traffic per sweep.  This kernel
tiles rows into VMEM, runs the K per-cluster quadratic forms on the MXU,
draws Gumbel noise from the on-core PRNG, and keeps the running
(max, argmax) in registers — HBM traffic drops to reading X once and
writing z once (speed-of-light for this op is the X read).

Inputs (precomputed in XLA from the likelihood's posterior draws):
  X     [N, D]     rows
  mu    [K, D]     cluster means
  binv  [K, D, D]  B_k = L_k^{-1} with L_k = chol(Σ_k): ‖(x−μ)Bᵀ‖² is the
                   Mahalanobis quadratic form
  base  [K]        log w_k − ½ log|Σ_k| − d/2 log 2π  (+ any extra logits)
  seed  int32      per-sweep PRNG seed (each row tile folds in its id)

Returns z [N] int32.  `interpret=True` runs the same kernel through the
Pallas interpreter for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_from_bits(bits):
    """uint32 → float32 uniform in [2^-24, 1): mantissa-fill trick."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return jnp.maximum(f - 1.0, 1e-7)


def _assign_kernel(seed_ref, x_ref, mu_ref, binv_ref, base_ref, z_ref):
    tile_n, d = x_ref.shape
    k = mu_ref.shape[0]

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits((tile_n, k)), jnp.uint32)
    gumbel = -jnp.log(-jnp.log(_uniform_from_bits(bits)))

    x = x_ref[:]

    # K is static: unroll so every ref/array index is constant (the Pallas
    # TPU lowering has no dynamic_slice on register arrays)
    best = jnp.full((tile_n,), -jnp.inf, jnp.float32)
    arg = jnp.zeros((tile_n,), jnp.int32)
    for i in range(k):
        dev = x - mu_ref[i, :]
        y = jax.lax.dot_general(
            dev, binv_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile_n, d] · B_kᵀ
        quad = jnp.sum(y * y, axis=-1)
        lp = base_ref[i] - 0.5 * quad + gumbel[:, i]
        take = lp > best
        best = jnp.where(take, lp, best)
        arg = jnp.where(take, jnp.int32(i), arg)
    z_ref[:, :] = arg.reshape(tile_n // 128, 128)


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_gaussian_assign(X, mu, binv, base, seed, tile_n: int = 1024,
                          interpret: bool = False):
    """Sample z_n ~ Cat(softmax_k(base_k − ½ Mahalanobis²)) for all rows.

    tile_n must be a multiple of 1024 (the int32 output retiles to
    [rows of 128] with 8-sublane blocks).
    """
    if tile_n % 1024:
        raise ValueError(f"tile_n must be a multiple of 1024, got {tile_n}")
    n, d = X.shape
    k = mu.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))

    grid = n_pad // tile_n
    z = pl.pallas_call(
        _assign_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile_n, d), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d, d), lambda i, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k,), lambda i, s: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n // 128, 128), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray(X, jnp.float32),
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(binv, jnp.float32),
        jnp.asarray(base, jnp.float32),
    )
    return z.reshape(n_pad)[:n]


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
