"""Numpy/scipy oracle implementations of the conjugate models.

The dual-backend cross-check analog of the reference's py_desc
(distributions.dbg pure-python models) vs c_desc (C++) agreement tests
(SURVEY.md §4): every JAX likelihood must agree with these independent
float64 implementations on pred_logpdf and marginal_loglik.
"""

from __future__ import annotations

import numpy as np
from scipy.special import betaln, gammaln, multigammaln
from scipy.stats import multivariate_t


# ---- beta-bernoulli -------------------------------------------------------
def bb_marginal(alpha, beta, heads, tails):
    return betaln(alpha + heads, beta + tails) - betaln(alpha, beta)


def bb_pred(alpha, beta, heads, n, x):
    if x:
        return np.log(alpha + heads) - np.log(alpha + beta + n)
    return np.log(beta + n - heads) - np.log(alpha + beta + n)


# ---- gamma-poisson --------------------------------------------------------
def gp_marginal(alpha, inv_beta, xs):
    xs = np.asarray(xs, float)
    a_n = alpha + xs.sum()
    b_n = inv_beta + len(xs)
    return (
        alpha * np.log(inv_beta)
        - a_n * np.log(b_n)
        + gammaln(a_n)
        - gammaln(alpha)
        - gammaln(xs + 1).sum()
    )


def gp_pred(alpha, inv_beta, xs, x):
    xs = np.asarray(xs, float)
    a_n = alpha + xs.sum()
    b_n = inv_beta + len(xs)
    return (
        gammaln(a_n + x)
        - gammaln(a_n)
        - gammaln(x + 1.0)
        + a_n * np.log(b_n / (b_n + 1.0))
        - x * np.log(b_n + 1.0)
    )


# ---- normal-inverse-chi-square -------------------------------------------
def nich_post(mu0, kappa, sigmasq, nu, xs):
    xs = np.asarray(xs, float)
    n = len(xs)
    kappa_n = kappa + n
    nu_n = nu + n
    if n:
        xbar = xs.mean()
        mu_n = (kappa * mu0 + n * xbar) / kappa_n
        ss = ((xs - xbar) ** 2).sum()
        s_n = (nu * sigmasq + ss + kappa * n / kappa_n * (xbar - mu0) ** 2) / nu_n
    else:
        mu_n, s_n = mu0, sigmasq
    return mu_n, kappa_n, s_n, nu_n


def nich_marginal(mu0, kappa, sigmasq, nu, xs):
    n = len(xs)
    mu_n, kappa_n, s_n, nu_n = nich_post(mu0, kappa, sigmasq, nu, xs)
    return (
        gammaln(nu_n / 2)
        - gammaln(nu / 2)
        + 0.5 * (np.log(kappa) - np.log(kappa_n))
        + 0.5 * nu * np.log(nu * sigmasq)
        - 0.5 * nu_n * np.log(nu_n * s_n)
        - 0.5 * n * np.log(np.pi)
    )


def nich_pred(mu0, kappa, sigmasq, nu, xs, x):
    from scipy.stats import t as student_t

    mu_n, kappa_n, s_n, nu_n = nich_post(mu0, kappa, sigmasq, nu, xs)
    scale = np.sqrt(s_n * (1 + kappa_n) / kappa_n)
    return student_t.logpdf(x, df=nu_n, loc=mu_n, scale=scale)


# ---- normal-inverse-wishart ----------------------------------------------
def niw_post(mu0, kappa, psi, nu, X):
    X = np.atleast_2d(np.asarray(X, float))
    n = len(X) if X.size else 0
    kappa_n = kappa + n
    nu_n = nu + n
    if n:
        xbar = X.mean(axis=0)
        mu_n = (kappa * mu0 + n * xbar) / kappa_n
        dev = X - xbar
        S = dev.T @ dev
        d0 = (xbar - mu0)[:, None]
        psi_n = psi + S + (kappa * n / kappa_n) * (d0 @ d0.T)
    else:
        mu_n, psi_n = mu0, psi
    return mu_n, kappa_n, psi_n, nu_n


def niw_marginal(mu0, kappa, psi, nu, X):
    X = np.atleast_2d(np.asarray(X, float))
    d = len(mu0)
    n = len(X) if X.size else 0
    mu_n, kappa_n, psi_n, nu_n = niw_post(mu0, kappa, psi, nu, X)
    return (
        -0.5 * n * d * np.log(np.pi)
        + multigammaln(nu_n / 2, d)
        - multigammaln(nu / 2, d)
        + 0.5 * nu * np.linalg.slogdet(psi)[1]
        - 0.5 * nu_n * np.linalg.slogdet(psi_n)[1]
        + 0.5 * d * (np.log(kappa) - np.log(kappa_n))
    )


def niw_pred(mu0, kappa, psi, nu, X, x):
    d = len(mu0)
    mu_n, kappa_n, psi_n, nu_n = niw_post(mu0, kappa, psi, nu, X)
    df = nu_n - d + 1
    shape = psi_n * (kappa_n + 1) / (kappa_n * df)
    return multivariate_t.logpdf(np.asarray(x, float), loc=mu_n, shape=shape, df=df)


# ---- dirichlet-discrete ---------------------------------------------------
def dd_marginal(alphas, counts):
    alphas = np.asarray(alphas, float)
    counts = np.asarray(counts, float)
    return (
        (gammaln(alphas + counts) - gammaln(alphas)).sum()
        + gammaln(alphas.sum())
        - gammaln(alphas.sum() + counts.sum())
    )


def dd_pred(alphas, counts, x):
    alphas = np.asarray(alphas, float)
    counts = np.asarray(counts, float)
    return np.log(alphas[x] + counts[x]) - np.log(alphas.sum() + counts.sum())


# ---- dirichlet-multinomial ------------------------------------------------
def dm_pred(alphas, counts, x):
    alphas = np.asarray(alphas, float) + np.asarray(counts, float)
    x = np.asarray(x, float)
    m = x.sum()
    coef = gammaln(m + 1) - gammaln(x + 1).sum()
    return (
        coef
        + (gammaln(alphas + x) - gammaln(alphas)).sum()
        + gammaln(alphas.sum())
        - gammaln(alphas.sum() + m)
    )


def dm_marginal(alphas, rows):
    rows = np.atleast_2d(np.asarray(rows, float))
    total = 0.0
    seen = np.zeros_like(np.asarray(alphas, float))
    for r in rows:
        total += dm_pred(alphas, seen, r)
        seen = seen + r
    return total


# ---- beta-negative-binomial ----------------------------------------------
def bnb_marginal(alpha, beta, r, xs):
    xs = np.asarray(xs, float)
    n = len(xs)
    coef = (gammaln(xs + r) - gammaln(r) - gammaln(xs + 1)).sum()
    return coef + betaln(alpha + r * n, beta + xs.sum()) - betaln(alpha, beta)


def bnb_pred(alpha, beta, r, xs, x):
    xs = np.asarray(xs, float)
    n = len(xs)
    a_n = alpha + r * n
    b_n = beta + xs.sum()
    coef = gammaln(x + r) - gammaln(r) - gammaln(x + 1.0)
    return coef + betaln(a_n + r, b_n + x) - betaln(a_n, b_n)
