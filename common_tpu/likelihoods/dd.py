"""Dirichlet–Discrete (categorical) likelihood (conjugate).

Reference analog: `distributions:include/distributions/models/dd.hpp`
(DirichletDiscrete<N>), surfaced as the ``dd(n)`` descriptor in
``common:microscopes/models.py``.

Data: integer category index in [0, C).  Suffstats: (n, counts[C]).
Hyper: alphas [C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from common_tpu.likelihoods import base


class DD(base.Likelihood):
    name = "dd"
    conjugate = True
    has_expfam = True

    # conjugate exponential family: T(pi) = log pi
    def posterior_hyper(self, hyper, stats):
        return {"alphas": hyper["alphas"] + stats["counts"]}

    def nat_params(self, hyper):
        return {"e": hyper["alphas"] - 1.0}

    def log_partition(self, nat):
        a = nat["e"] + 1.0
        return jnp.sum(gammaln(a), axis=-1) - gammaln(jnp.sum(a, axis=-1))

    def suffstat_pair(self, hyper, x, mask):
        c = hyper["alphas"].shape[-1]
        m = jnp.asarray(mask, jnp.float32)
        onehot = jax.nn.one_hot(jnp.asarray(x, jnp.int32), c, dtype=jnp.float32)
        return {"e": m * onehot}

    def log_h(self, hyper, x, mask):
        return jnp.zeros_like(jnp.asarray(x, jnp.float32))

    def default_hyper(self):
        return {"alphas": jnp.ones(2)}

    def init_stats(self, hyper, batch_shape):
        c = hyper["alphas"].shape[-1]
        return {
            "n": jnp.zeros(batch_shape, jnp.float32),
            "counts": jnp.zeros((*batch_shape, c), jnp.float32),
        }

    def tx(self, hyper, x, mask):
        c = hyper["alphas"].shape[-1]
        m = jnp.asarray(mask, jnp.float32)
        onehot = jax.nn.one_hot(jnp.asarray(x, jnp.int32), c, dtype=jnp.float32)
        return {"n": m, "counts": m * onehot}

    def marginal_loglik(self, hyper, stats):
        a = hyper["alphas"]
        cnt = stats["counts"]
        a0 = jnp.sum(a, axis=-1)
        return (
            jnp.sum(gammaln(a + cnt) - gammaln(a), axis=-1)
            + gammaln(a0)
            - gammaln(a0 + stats["n"])
        )

    def pred_logpdf(self, hyper, stats, x):
        a = hyper["alphas"]
        cnt = stats["counts"]
        a0 = jnp.sum(a, axis=-1)
        xi = jnp.asarray(x, jnp.int32)
        num = jnp.take_along_axis(
            a + cnt, jnp.broadcast_to(xi, cnt.shape[:-1])[..., None], axis=-1
        )[..., 0]
        return jnp.log(num) - jnp.log(a0 + stats["n"])

    def sample_params(self, key, hyper, stats):
        a_n = hyper["alphas"] + stats["counts"]
        return {"logp": jnp.log(jax.random.dirichlet(key, a_n))}

    def logpdf(self, theta, x):
        xi = jnp.asarray(x, jnp.int32)
        lp = theta["logp"]
        return jnp.take_along_axis(
            lp, jnp.broadcast_to(xi, lp.shape[:-1])[..., None], axis=-1
        )[..., 0]

    def logpdf_batch(self, theta, X, mask):
        # gather columns: [N] indices into [K, C] log-probs -> [N, K]
        out = theta["logp"][:, jnp.asarray(X, jnp.int32)].T
        return out * mask[:, None]

    def sample_value(self, key, theta):
        return jax.random.categorical(key, theta["logp"], axis=-1)

    def prior_logpdf(self, hyper, theta):
        a = hyper["alphas"]
        lp = theta["logp"]
        a0 = jnp.sum(a, axis=-1)
        return (
            gammaln(a0)
            - jnp.sum(gammaln(a), axis=-1)
            + jnp.sum((a - 1.0) * lp, axis=-1)
        )


dd = base.register(DD())
