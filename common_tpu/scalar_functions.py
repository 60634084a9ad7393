"""Scalar log-density functions for hyperparameter grid Gibbs.

Rebuild of ``common:include/microscopes/common/scalar_functions.hpp`` /
``_scalar_functions.pyx``: small log-density callables used as hyperpriors
when grid-Gibbs-sampling hyperparameters (kernels' gibbs.hp spec `hpdf`).
Here they are plain JAX-traceable closures; each returns logp given either
a scalar or a hyper dict (a named field is extracted first).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def _extract(x, field):
    if isinstance(x, dict):
        if field is None:
            if len(x) != 1:
                raise ValueError(
                    f"hyper dict has keys {sorted(x)}; pass field= to select one"
                )
            (x,) = x.values()
        else:
            x = x[field]
    return jnp.asarray(x, jnp.float32)


def log_exponential(lam, field=None):
    """log Exp(x | rate lam)."""
    lam = jnp.asarray(lam, jnp.float32)

    def fn(x):
        x = _extract(x, field)
        return jnp.log(lam) - lam * x

    return fn


def log_normal(mu, var, field=None):
    """log N(x | mu, var)."""
    mu = jnp.asarray(mu, jnp.float32)
    var = jnp.asarray(var, jnp.float32)

    def fn(x):
        x = _extract(x, field)
        return -0.5 * ((x - mu) ** 2 / var + jnp.log(2.0 * jnp.pi * var))

    return fn


def log_gamma(shape, rate, field=None):
    """log Gamma(x | shape, rate)."""
    shape = jnp.asarray(shape, jnp.float32)
    rate = jnp.asarray(rate, jnp.float32)

    def fn(x):
        x = _extract(x, field)
        return (
            shape * jnp.log(rate)
            - gammaln(shape)
            + (shape - 1.0) * jnp.log(x)
            - rate * x
        )

    return fn


def log_noninformative_beta(field=None):
    """The reference's noninformative prior over (alpha, beta) of a Beta:
    p(a, b) ∝ (a + b)^(-5/2)  (Gelman's hyperprior for hierarchical Betas).
    Expects a dict with 'alpha' and 'beta' (field ignored)."""

    def fn(x):
        a = jnp.asarray(x["alpha"], jnp.float32)
        b = jnp.asarray(x["beta"], jnp.float32)
        return -2.5 * jnp.log(a + b)

    return fn


def sum_fns(*fns):
    """Sum of log-densities (joint independent prior over several fields)."""

    def fn(x):
        return sum(f(x) for f in fns)

    return fn
