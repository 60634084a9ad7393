"""Gamma–Poisson likelihood (conjugate).

Reference analog: `distributions:include/distributions/models/gp.hpp`
(GammaPoisson), surfaced as the ``gp`` descriptor in
``common:microscopes/models.py``.

Suffstats: (n, Σx, Σ log x!).  Hyper: alpha (shape), inv_beta (rate).
Predictive is negative-binomial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from common_tpu.likelihoods import base


class GP(base.Likelihood):
    name = "gp"
    conjugate = True
    has_expfam = True

    # conjugate exponential family: T(lam) = (log lam, -lam)
    def posterior_hyper(self, hyper, stats):
        return {
            "alpha": hyper["alpha"] + stats["sum_x"],
            "inv_beta": hyper["inv_beta"] + stats["n"],
        }

    def nat_params(self, hyper):
        return {"e1": hyper["alpha"] - 1.0, "e2": hyper["inv_beta"]}

    def log_partition(self, nat):
        shape = nat["e1"] + 1.0
        return gammaln(shape) - shape * jnp.log(nat["e2"])

    def suffstat_pair(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        xf = jnp.asarray(x, jnp.float32)
        return {"e1": m * xf, "e2": m}

    def log_h(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        return -m * gammaln(jnp.asarray(x, jnp.float32) + 1.0)

    def default_hyper(self):
        return {"alpha": jnp.asarray(1.0), "inv_beta": jnp.asarray(1.0)}

    def init_stats(self, hyper, batch_shape):
        z = jnp.zeros(batch_shape, jnp.float32)
        return {"n": z, "sum_x": z, "sum_log_fact": z}

    def tx(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        xf = jnp.asarray(x, jnp.float32)
        return {
            "n": m,
            "sum_x": m * xf,
            "sum_log_fact": m * gammaln(xf + 1.0),
        }

    def marginal_loglik(self, hyper, stats):
        a, b = hyper["alpha"], hyper["inv_beta"]
        a_n = a + stats["sum_x"]
        b_n = b + stats["n"]
        return (
            a * jnp.log(b)
            - a_n * jnp.log(b_n)
            + gammaln(a_n)
            - gammaln(a)
            - stats["sum_log_fact"]
        )

    def pred_logpdf(self, hyper, stats, x):
        a_n = hyper["alpha"] + stats["sum_x"]
        b_n = hyper["inv_beta"] + stats["n"]
        xf = jnp.asarray(x, jnp.float32)
        return (
            gammaln(a_n + xf)
            - gammaln(a_n)
            - gammaln(xf + 1.0)
            + a_n * jnp.log(b_n / (b_n + 1.0))
            - xf * jnp.log(b_n + 1.0)
        )

    def sample_params(self, key, hyper, stats):
        a_n = hyper["alpha"] + stats["sum_x"]
        b_n = hyper["inv_beta"] + stats["n"]
        lam = jax.random.gamma(key, a_n) / b_n
        return {"lam": lam}

    def logpdf(self, theta, x):
        xf = jnp.asarray(x, jnp.float32)
        lam = theta["lam"]
        return xf * jnp.log(lam) - lam - gammaln(xf + 1.0)

    def logpdf_batch(self, theta, X, mask):
        xf = jnp.asarray(X, jnp.float32)[:, None]
        lam = theta["lam"][None, :]
        out = xf * jnp.log(lam) - lam - gammaln(xf + 1.0)
        return out * mask[:, None]

    def sample_value(self, key, theta):
        return jax.random.poisson(key, theta["lam"])

    def prior_logpdf(self, hyper, theta):
        a, b = hyper["alpha"], hyper["inv_beta"]
        lam = theta["lam"]
        return a * jnp.log(b) - gammaln(a) + (a - 1.0) * jnp.log(lam) - b * lam


gp = base.register(GP())
