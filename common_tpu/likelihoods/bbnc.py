"""Non-conjugate Beta–Bernoulli (explicit per-cluster p) — test fixture.

Reference analog: ``common:include/microscopes/models/bbnc.hpp``, the model
the reference ships *specifically* to exercise non-conjugate inference
paths (MH/slice on the explicit latent p) — its score_value uses the
current p rather than a closed-form predictive, and its score_data is the
joint log p(p | hyper) + log p(data | p).

Here the explicit latent lives inside the suffstat pytree as a
non-additive leaf (``tx`` contributes zero to it); the slice/MH kernels
resample it via :meth:`posterior_logpdf_unnorm`, and
:meth:`refresh_latents` re-draws it from the prior for empty slots so that
birth proposals (Neal algorithm 8 aux groups) score correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln

from common_tpu.likelihoods import base

_EPS = 1e-6


def _safe_p(p):
    return jnp.clip(p, _EPS, 1.0 - _EPS)


class BBNC(base.Likelihood):
    name = "bbnc"
    conjugate = False
    latent_leaves = ("p",)
    latent_bounds = {"p": (_EPS, 1.0 - _EPS)}

    def default_hyper(self):
        return {"alpha": jnp.asarray(1.0), "beta": jnp.asarray(1.0)}

    def init_stats(self, hyper, batch_shape):
        z = jnp.zeros(batch_shape, jnp.float32)
        # p = 0.5 sentinel keeps scores finite before the first refresh
        return {"n": z, "heads": z, "p": jnp.full(batch_shape, 0.5, jnp.float32)}

    def tx(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        return {
            "n": m,
            "heads": m * jnp.asarray(x, jnp.float32),
            "p": jnp.zeros((), jnp.float32),  # latent: not additive
        }

    def refresh_latents(self, key, hyper, stats, refresh_mask):
        """Redraw p ~ Beta(alpha, beta) where refresh_mask is set."""
        fresh = jax.random.beta(
            key,
            jnp.broadcast_to(hyper["alpha"], stats["p"].shape),
            jnp.broadcast_to(hyper["beta"], stats["p"].shape),
        )
        p = jnp.where(refresh_mask, fresh, stats["p"])
        return {**stats, "p": p}

    def pred_logpdf(self, hyper, stats, x):
        # score_value under the *current* explicit latent (bbnc.hpp behavior)
        p = _safe_p(stats["p"])
        x = jnp.asarray(x, jnp.float32)
        return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)

    def marginal_loglik(self, hyper, stats):
        # joint: log prior(p) + log lik(data | p)   (score_data analog)
        p = _safe_p(stats["p"])
        h, t = stats["heads"], stats["n"] - stats["heads"]
        prior = (
            (hyper["alpha"] - 1.0) * jnp.log(p)
            + (hyper["beta"] - 1.0) * jnp.log1p(-p)
            - betaln(hyper["alpha"], hyper["beta"])
        )
        return prior + h * jnp.log(p) + t * jnp.log1p(-p)

    def posterior_logpdf_unnorm(self, hyper, stats, p):
        """Unnormalized log p(p | data, hyper) — the slice/MH target."""
        p = _safe_p(p)
        h, t = stats["heads"], stats["n"] - stats["heads"]
        return (hyper["alpha"] - 1.0 + h) * jnp.log(p) + (
            hyper["beta"] - 1.0 + t
        ) * jnp.log1p(-p)

    def sample_params(self, key, hyper, stats):
        # exact conditional is available (it *is* conjugate analytically);
        # used only for validating the slice/MH kernels against truth
        a = hyper["alpha"] + stats["heads"]
        b = hyper["beta"] + stats["n"] - stats["heads"]
        return {"p": jax.random.beta(key, a, b)}

    def logpdf(self, theta, x):
        p = _safe_p(theta["p"])
        x = jnp.asarray(x, jnp.float32)
        return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)

    def sample_value(self, key, theta):
        return jax.random.bernoulli(key, theta["p"])

    def prior_logpdf(self, hyper, theta):
        p = _safe_p(theta["p"])
        return (
            (hyper["alpha"] - 1.0) * jnp.log(p)
            + (hyper["beta"] - 1.0) * jnp.log1p(-p)
            - betaln(hyper["alpha"], hyper["beta"])
        )


bbnc = base.register(BBNC())
