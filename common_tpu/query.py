"""Posterior query utilities over collected assignment samples.

Rebuild of ``common:microscopes/common/query.py``: co-assignment ("z")
matrix computation, block-ordering heuristic for heatmap display, and
group extraction.  zmatrix is computed on-device as one batched
equality-outer-product reduction over samples (vs the reference's
per-sample Python loop).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def zmatrix(assignments) -> np.ndarray:
    """N×N co-assignment frequency matrix from S assignment samples.

    assignments: [S, N] int array (or list of length-N vectors).
    z[i, j] = fraction of samples in which i and j share a cluster.
    """
    a = jnp.asarray(np.asarray(assignments))
    if a.ndim != 2:
        raise ValueError(f"expected [S, N] assignments, got shape {a.shape}")

    @jax.jit
    def _z(a):
        eq = (a[:, :, None] == a[:, None, :]).astype(jnp.float32)
        return jnp.mean(eq, axis=0)

    return np.asarray(_z(a))


def zmatrix_reorder(z, order) -> np.ndarray:
    """Symmetrically permute a z-matrix by the given row/col order."""
    z = np.asarray(z)
    order = np.asarray(order)
    return z[np.ix_(order, order)]


def zmatrix_heuristic_block_ordering(z) -> np.ndarray:
    """Greedy similarity ordering so co-assigned blocks appear contiguous.

    Same intent as the reference's heuristic: start from the row with the
    strongest total co-assignment, then repeatedly append the unvisited row
    most co-assigned with the current one.
    """
    z = np.asarray(z)
    n = z.shape[0]
    visited = np.zeros(n, dtype=bool)
    cur = int(np.argmax(z.sum(axis=1)))
    order = [cur]
    visited[cur] = True
    for _ in range(n - 1):
        sims = np.where(visited, -np.inf, z[cur])
        cur = int(np.argmax(sims))
        order.append(cur)
        visited[cur] = True
    return np.asarray(order)


def groups(assignment) -> List[np.ndarray]:
    """List of entity-index arrays, one per group (reference query.groups)."""
    a = np.asarray(assignment)
    out = []
    for gid in np.unique(a):
        if gid < 0:
            continue
        out.append(np.nonzero(a == gid)[0])
    return out


def posterior_predictive_logp(scores: Sequence[float]) -> float:
    """Monte-Carlo predictive log-likelihood from per-sample logp values:
    log (1/S) Σ exp(score_s) — a logsumexp over posterior samples."""
    s = np.asarray(scores, np.float64)
    m = s.max()
    return float(m + np.log(np.mean(np.exp(s - m))))
