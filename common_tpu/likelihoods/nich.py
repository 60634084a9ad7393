"""Normal–Inverse-Chi-Square likelihood (scalar Gaussian, conjugate).

Reference analog: `distributions:include/distributions/models/nich.hpp`
(NormalInverseChiSq Shared/Group), surfaced as the ``nich`` descriptor in
``common:microscopes/models.py``.

Suffstats: (n, Σx, Σx²).  Closed-form scalar formulas (no 1x1 Cholesky).
Hyper: mu (prior mean), kappa (mean pseudo-count; reference `lambda`),
sigmasq (prior variance), nu (variance pseudo-count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from common_tpu.likelihoods import base


def _student_t_logpdf(x, df, loc, scale_sq):
    z2 = (x - loc) ** 2 / scale_sq
    return (
        gammaln((df + 1.0) / 2.0)
        - gammaln(df / 2.0)
        - 0.5 * (jnp.log(df) + jnp.log(jnp.pi) + jnp.log(scale_sq))
        - 0.5 * (df + 1.0) * jnp.log1p(z2 / df)
    )


class NICH(base.Likelihood):
    name = "nich"
    conjugate = True
    has_expfam = True

    # conjugate exponential family over (mu, sigmasq):
    # T = (mu/s2, -1/(2 s2), -mu^2/(2 s2), -1/2 log s2),
    # eta = (kappa mu0, nu sigmasq0 + kappa mu0^2, kappa, nu + 3).
    def nat_params(self, hyper):
        mu0, kappa = hyper["mu"], hyper["kappa"]
        return {
            "e1": kappa * mu0,
            "e2": hyper["nu"] * hyper["sigmasq"] + kappa * mu0 * mu0,
            "e3": kappa,
            "e4": hyper["nu"] + 3.0,
        }

    def log_partition(self, nat):
        kappa = nat["e3"]
        nu = nat["e4"] - 3.0
        nu_s0 = nat["e2"] - nat["e1"] * nat["e1"] / kappa
        return (
            0.5 * (jnp.log(2.0 * jnp.pi) - jnp.log(kappa))
            + gammaln(nu / 2.0)
            + 0.5 * nu * (jnp.log(2.0) - jnp.log(nu_s0))
        )

    def suffstat_pair(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        xf = jnp.asarray(x, jnp.float32)
        return {"e1": m * xf, "e2": m * xf * xf, "e3": m, "e4": m}

    def log_h(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.float32)
        return -0.5 * jnp.log(2.0 * jnp.pi) * m

    def default_hyper(self):
        return {
            "mu": jnp.asarray(0.0),
            "kappa": jnp.asarray(1.0),
            "sigmasq": jnp.asarray(1.0),
            "nu": jnp.asarray(1.0),
        }

    def init_stats(self, hyper, batch_shape):
        dt = jnp.asarray(hyper["mu"]).dtype
        z = jnp.zeros(batch_shape, dt)
        return {"n": z, "sum_x": z, "sum_xsq": z}

    def tx(self, hyper, x, mask):
        m = jnp.asarray(mask, jnp.result_type(x, jnp.float32))
        x = jnp.asarray(x, m.dtype)
        return {"n": m, "sum_x": m * x, "sum_xsq": m * x * x}

    def posterior_hyper(self, hyper, stats):
        mu0, kappa, sigmasq, nu = (
            hyper["mu"], hyper["kappa"], hyper["sigmasq"], hyper["nu"],
        )
        n, sx, sxx = stats["n"], stats["sum_x"], stats["sum_xsq"]
        kappa_n = kappa + n
        mu_n = (kappa * mu0 + sx) / kappa_n
        nu_n = nu + n
        # nu_n sigmasq_n = nu sigmasq + (Σx² - n x̄²) + κn/κ_n (x̄-μ0)²
        # guarded for n = 0 (empty cluster: posterior == prior)
        safe_n = jnp.maximum(n, 1.0)
        xbar = sx / safe_n
        ss = jnp.maximum(sxx - safe_n * xbar * xbar, 0.0)
        extra = jnp.where(
            n > 0, ss + (kappa * n / kappa_n) * (xbar - mu0) ** 2, 0.0
        )
        sigmasq_n = (nu * sigmasq + extra) / nu_n
        return {"mu": mu_n, "kappa": kappa_n, "sigmasq": sigmasq_n, "nu": nu_n}

    def marginal_loglik(self, hyper, stats):
        post = self.posterior_hyper(hyper, stats)
        n = stats["n"]
        return (
            gammaln(post["nu"] / 2.0)
            - gammaln(hyper["nu"] / 2.0)
            + 0.5 * (jnp.log(hyper["kappa"]) - jnp.log(post["kappa"]))
            + 0.5 * hyper["nu"] * jnp.log(hyper["nu"] * hyper["sigmasq"])
            - 0.5 * post["nu"] * jnp.log(post["nu"] * post["sigmasq"])
            - 0.5 * n * jnp.log(jnp.pi)
        )

    def pred_logpdf(self, hyper, stats, x):
        post = self.posterior_hyper(hyper, stats)
        df = post["nu"]
        scale_sq = post["sigmasq"] * (1.0 + post["kappa"]) / post["kappa"]
        return _student_t_logpdf(x, df, post["mu"], scale_sq)

    def sample_params(self, key, hyper, stats):
        post = self.posterior_hyper(hyper, stats)
        kv, km = jax.random.split(key)
        shape = jnp.shape(post["mu"])
        dt = jnp.asarray(post["mu"]).dtype
        # sigma² ~ nu_n sigmasq_n / chi2(nu_n)
        chi = 2.0 * jax.random.gamma(kv, post["nu"] / 2.0, shape, dt)
        var = post["nu"] * post["sigmasq"] / chi
        mu = post["mu"] + jnp.sqrt(var / post["kappa"]) * jax.random.normal(km, shape, dt)
        return {"mu": mu, "var": var}

    def logpdf(self, theta, x):
        return (
            -0.5 * (x - theta["mu"]) ** 2 / theta["var"]
            - 0.5 * jnp.log(2.0 * jnp.pi * theta["var"])
        )

    def sample_value(self, key, theta):
        return theta["mu"] + jnp.sqrt(theta["var"]) * jax.random.normal(
            key, jnp.shape(theta["mu"]), jnp.asarray(theta["mu"]).dtype
        )

    def prior_logpdf(self, hyper, theta):
        mu0, kappa, sigmasq, nu = (
            hyper["mu"], hyper["kappa"], hyper["sigmasq"], hyper["nu"],
        )
        var = theta["var"]
        # scaled-inverse-chi-square on var
        half_nu = nu / 2.0
        ics = (
            half_nu * jnp.log(half_nu * sigmasq)
            - gammaln(half_nu)
            - (half_nu + 1.0) * jnp.log(var)
            - half_nu * sigmasq / var
        )
        norm = (
            -0.5 * kappa * (theta["mu"] - mu0) ** 2 / var
            - 0.5 * jnp.log(2.0 * jnp.pi * var / kappa)
        )
        return ics + norm


nich = base.register(NICH())
