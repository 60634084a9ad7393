"""Beta–Bernoulli likelihood (conjugate).

Reference analog: `distributions:include/distributions/models/bb.hpp`
(BetaBernoulli), surfaced as the ``bb`` descriptor in
``common:microscopes/models.py``.

Suffstats: (n, heads).  Hyper: alpha, beta.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln

from common_tpu.likelihoods import base


class BB(base.Likelihood):
    name = "bb"
    conjugate = True
    has_expfam = True

    # conjugate exponential family: T(p) = (log p, log(1-p))
    def posterior_hyper(self, hyper, stats):
        return {
            "alpha": hyper["alpha"] + stats["heads"],
            "beta": hyper["beta"] + stats["n"] - stats["heads"],
        }

    def nat_params(self, hyper):
        return {"a": hyper["alpha"] - 1.0, "b": hyper["beta"] - 1.0}

    def log_partition(self, nat):
        return betaln(nat["a"] + 1.0, nat["b"] + 1.0)

    def suffstat_pair(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        xf = jnp.asarray(x, jnp.float32)
        return {"a": m * xf, "b": m * (1.0 - xf)}

    def log_h(self, hyper, x, mask):
        return jnp.zeros_like(jnp.asarray(x, jnp.float32))

    def default_hyper(self):
        return {"alpha": jnp.asarray(1.0), "beta": jnp.asarray(1.0)}

    def init_stats(self, hyper, batch_shape):
        z = jnp.zeros(batch_shape, jnp.float32)
        return {"n": z, "heads": z}

    def tx(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        return {"n": m, "heads": m * jnp.asarray(x, jnp.float32)}

    def marginal_loglik(self, hyper, stats):
        a, b = hyper["alpha"], hyper["beta"]
        h, t = stats["heads"], stats["n"] - stats["heads"]
        return betaln(a + h, b + t) - betaln(a, b)

    def pred_logpdf(self, hyper, stats, x):
        a, b = hyper["alpha"], hyper["beta"]
        h = stats["heads"]
        n = stats["n"]
        logp_head = jnp.log(a + h) - jnp.log(a + b + n)
        logp_tail = jnp.log(b + n - h) - jnp.log(a + b + n)
        x = jnp.asarray(x, jnp.float32)
        return x * logp_head + (1.0 - x) * logp_tail

    def sample_params(self, key, hyper, stats):
        a = hyper["alpha"] + stats["heads"]
        b = hyper["beta"] + stats["n"] - stats["heads"]
        p = jax.random.beta(key, a, b)
        return {"p": p}

    def logpdf(self, theta, x):
        x = jnp.asarray(x, jnp.float32)
        p = theta["p"]
        return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)

    def logpdf_batch(self, theta, X, mask):
        # [N] x [K] outer: heads pick log p, tails pick log(1-p)
        x = jnp.asarray(X, jnp.float32)[:, None]
        lp = jnp.log(theta["p"])[None, :]
        lq = jnp.log1p(-theta["p"])[None, :]
        return (x * lp + (1.0 - x) * lq) * mask[:, None]

    def sample_value(self, key, theta):
        return jax.random.bernoulli(key, theta["p"])

    def prior_logpdf(self, hyper, theta):
        a, b = hyper["alpha"], hyper["beta"]
        p = theta["p"]
        return (a - 1.0) * jnp.log(p) + (b - 1.0) * jnp.log1p(-p) - betaln(a, b)


bb = base.register(BB())
