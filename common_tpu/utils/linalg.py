"""Batched dense linear algebra tuned for TPU (the Cholesky hot path).

XLA's `jnp.linalg.cholesky` processes a batch of matrices essentially
sequentially on TPU — measured 33 us per [256, 256] matrix regardless of
batch size (170 GFLOP/s, ~0.2% of peak; BENCH_NOTES.md round 4).  That
made the NIW posterior-draw factorization the dominant cost of block-SMC
at config-5 scale and a visible slice of the blocked-Gibbs headline.

`cholesky_batched` is a right-looking PANEL algorithm expressed in plain
XLA ops so every step is batch-parallel:

  - the [b, r, r] diagonal block factors via a masked `lax.scan` over r
    column steps (each step is [b, r]/[b, r, r] elementwise work across
    the WHOLE batch — no per-matrix loop);
  - the panel below solves against the diagonal factor with
    `triangular_solve` (fast on TPU — 2.6 ms for [1024, 256, 256]);
  - the trailing update A22 -= L21 L21ᵀ is a batched matmul (MXU).

Measured: [1024, 256, 256] factors in ~4 ms vs 34.5 ms for
`jnp.linalg.cholesky` (see tests/test_linalg.py for the agreement
battery: random PSD batches, f64 reference, jitter edge cases).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _chol_unblocked(A):
    """Batched unblocked Cholesky of [b, r, r] via a masked column scan.

    Each of the r steps normalizes column j across the whole batch and
    applies the rank-1 trailing update to columns > j (masked full-width
    ops — no dynamic shapes).  Rows above the diagonal of the returned
    factor are zero.
    """
    r = A.shape[-1]
    idx = jnp.arange(r)

    def step(A, j):
        dj = jnp.take_along_axis(
            jnp.diagonal(A, axis1=-2, axis2=-1), j[None, None], axis=-1
        )[..., 0]                                    # [b] A[:, j, j]
        # non-positive pivot -> sqrt(neg) = NaN, propagating like XLA's
        # cholesky (consumers' NaN-retry logic depends on this)
        col = jnp.take_along_axis(A, j[None, None, None], axis=-1)[..., 0]
        col = col / jnp.sqrt(dj)[:, None]            # [b, r]
        col = jnp.where(idx[None, :] >= j, col, 0.0)
        upd = col[:, :, None] * col[:, None, :]      # [b, r, r]
        # jnp.where (not *mask): NaN * 0 = NaN would leak into the
        # already-factored region
        A = A - jnp.where(idx[None, None, :] > j, upd, 0.0)
        return A, col

    _, cols = lax.scan(step, A, jnp.arange(r))
    return jnp.moveaxis(cols, 0, -1)                 # columns j -> [b, r, r]


@partial(jax.jit, static_argnames=("panel",))
def cholesky_batched(M, panel: int = 64):
    """Lower-triangular Cholesky factor of a batch of PSD matrices.

    M: [..., D, D] (any leading batch shape).  Matches
    `jnp.linalg.cholesky` to f32 tolerance, including NaN propagation on
    non-PSD input.  D that doesn't divide by `panel` pads with an
    identity block (factored exactly, then sliced away).
    """
    batch_shape = M.shape[:-2]
    D = M.shape[-1]
    A = M.reshape((-1, D, D))
    if D <= panel:
        return _chol_unblocked(A).reshape(M.shape)

    if D % panel:
        pad = panel - D % panel
        eye_pad = jnp.zeros((A.shape[0], D + pad, D + pad), A.dtype)
        eye_pad = eye_pad.at[:, :D, :D].set(A)
        eye_pad = eye_pad.at[:, D:, D:].set(
            jnp.eye(pad, dtype=A.dtype)[None]
        )
        L = cholesky_batched(eye_pad, panel=panel)[:, :D, :D]
        return L.reshape(M.shape)
    b = A.shape[0]
    out_panels = []
    for p in range(0, D, panel):
        diag = A[:, p:p + panel, p:p + panel]
        L11 = _chol_unblocked(diag)
        below = A[:, p + panel:, p:p + panel]        # [b, D-p-r, r]
        # L21 solves L21 @ L11ᵀ = A21
        L21 = lax.linalg.triangular_solve(
            L11, below, left_side=False, lower=True, transpose_a=True,
        )
        # trailing update: A22 -= L21 @ L21ᵀ  (batched MXU matmul;
        # f32 precision — the result feeds further factorization steps
        # and bf16 drift here compounds into the trailing panels)
        if p + panel < D:
            A22 = A[:, p + panel:, p + panel:]
            A22 = A22 - jnp.einsum(
                "bij,bkj->bik", L21, L21, precision="float32"
            )
            A = A.at[:, p + panel:, p + panel:].set(A22)
        col = jnp.concatenate(
            [jnp.zeros((b, p, panel), A.dtype), L11, L21], axis=1
        )
        out_panels.append(col)
    L = jnp.concatenate(out_panels, axis=-1)
    # zero the strict upper triangle via where (a *mask product would
    # turn a propagating NaN times zero into NaN above the diagonal,
    # where XLA's cholesky keeps exact zeros)
    i = jnp.arange(D)
    L = jnp.where((i[:, None] >= i[None, :])[None], L, 0.0)
    return L.reshape(M.shape)


def cholesky(M, panel: int = 64):
    """Size-dispatching Cholesky: the blocked batch algorithm where it
    wins (large batch x dim products — up to 10x XLA's on TPU), XLA's
    native path for small problems (where LAPACK-style custom calls are
    already fast, e.g. the CPU test tier)."""
    import numpy as _np

    D = M.shape[-1]
    b = int(_np.prod(M.shape[:-2], dtype=_np.int64)) if M.ndim > 2 else 1
    if D < 32 or b * D < 2048:
        return jnp.linalg.cholesky(M)
    return cholesky_batched(M, panel=panel)
