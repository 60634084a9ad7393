"""Misc numeric helpers (rebuild of ``common:microscopes/common/util.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def logsumexp(a, axis=None):
    return jax.scipy.special.logsumexp(jnp.asarray(a), axis=axis)


def almost_eq(a, b, rtol=1e-5, atol=1e-6) -> bool:
    return bool(np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol))


def random_orthonormal_matrix(key, n: int):
    """Haar-random orthonormal matrix via QR of a Gaussian."""
    g = jax.random.normal(key, (n, n))
    q, r = jnp.linalg.qr(g)
    # fix signs for uniqueness/Haar correctness
    d = jnp.sign(jnp.diagonal(r))
    return q * d[None, :]


def random_assignment_vector(key, n: int, k: int):
    """Uniform random assignment of n entities into ≤ k groups."""
    return jax.random.randint(key, (n,), 0, k, dtype=jnp.int32)
