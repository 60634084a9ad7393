"""Beta–Negative-Binomial likelihood (conjugate).

Reference analog: `distributions:include/distributions/models/bnb.hpp`
(BetaNegativeBinomial), surfaced as the ``bnb`` descriptor in
``common:microscopes/models.py``.

Data: nonnegative int x.  p(x | p) = C(x+r-1, x) p^r (1-p)^x with
p ~ Beta(alpha, beta); r is a fixed hyper.
Suffstats: (n, Σx, Σ log C(x+r-1, x)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln

from common_tpu.likelihoods import base


def _log_nb_coef(x, r):
    return gammaln(x + r) - gammaln(r) - gammaln(x + 1.0)


class BNB(base.Likelihood):
    name = "bnb"
    conjugate = True

    def default_hyper(self):
        return {
            "alpha": jnp.asarray(1.0),
            "beta": jnp.asarray(1.0),
            "r": jnp.asarray(1.0),
        }

    def init_stats(self, hyper, batch_shape):
        z = jnp.zeros(batch_shape, jnp.float32)
        return {"n": z, "sum_x": z, "sum_log_coef": z}

    def tx(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        xf = jnp.asarray(x, jnp.float32)
        return {
            "n": m,
            "sum_x": m * xf,
            "sum_log_coef": m * _log_nb_coef(xf, hyper["r"]),
        }

    def marginal_loglik(self, hyper, stats):
        a, b, r = hyper["alpha"], hyper["beta"], hyper["r"]
        return (
            stats["sum_log_coef"]
            + betaln(a + r * stats["n"], b + stats["sum_x"])
            - betaln(a, b)
        )

    def pred_logpdf(self, hyper, stats, x):
        a, b, r = hyper["alpha"], hyper["beta"], hyper["r"]
        a_n = a + r * stats["n"]
        b_n = b + stats["sum_x"]
        xf = jnp.asarray(x, jnp.float32)
        return _log_nb_coef(xf, r) + betaln(a_n + r, b_n + xf) - betaln(a_n, b_n)

    def sample_params(self, key, hyper, stats):
        a_n = hyper["alpha"] + hyper["r"] * stats["n"]
        b_n = hyper["beta"] + stats["sum_x"]
        return {"p": jax.random.beta(key, a_n, b_n), "r": hyper["r"]}

    def logpdf(self, theta, x):
        xf = jnp.asarray(x, jnp.float32)
        p, r = theta["p"], theta["r"]
        return _log_nb_coef(xf, r) + r * jnp.log(p) + xf * jnp.log1p(-p)

    def logpdf_batch(self, theta, X, mask):
        xf = jnp.asarray(X, jnp.float32)[:, None]
        p, r = theta["p"][None, :], theta["r"]
        out = _log_nb_coef(xf, r) + r * jnp.log(p) + xf * jnp.log1p(-p)
        return out * mask[:, None]

    def sample_value(self, key, theta):
        # NB(r, p) as Poisson(Gamma(r, p/(1-p)))  [success-prob convention
        # matching p^r (1-p)^x]
        kg, kp = jax.random.split(key)
        p, r = theta["p"], theta["r"]
        lam = jax.random.gamma(kg, r * jnp.ones_like(p)) * (1.0 - p) / p
        return jax.random.poisson(kp, lam)

    def prior_logpdf(self, hyper, theta):
        a, b = hyper["alpha"], hyper["beta"]
        p = theta["p"]
        return (a - 1.0) * jnp.log(p) + (b - 1.0) * jnp.log1p(-p) - betaln(a, b)


bnb = base.register(BNB())
