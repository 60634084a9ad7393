"""Likelihood layer tests.

Two batteries, per SURVEY.md §4's dual-backend methodology:
 1. cross-check every JAX likelihood against the independent float64
    scipy oracles in ref_impls.py (py_desc-vs-c_desc analog);
 2. generic self-consistency laws that hold for any conjugate model:
    - marginal(∅) == 0
    - chain rule: marginal(D ∪ x) − marginal(D) == pred_logpdf(D, x)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_impls as ref
from common_tpu import likelihoods as lik
from common_tpu import models

KEY = jax.random.key(0)


def _stats_from_rows(likelihood, hyper, rows):
    """Fold a list of rows into a single (unbatched) suffstat pytree."""
    stats = likelihood.init_stats(hyper, ())
    for r in rows:
        stats = lik.fold(stats, likelihood.tx(hyper, jnp.asarray(r), 1.0), 1.0)
    return stats


# ---------------------------------------------------------------------------
# battery 1: scipy oracle agreement
# ---------------------------------------------------------------------------
def test_bb_vs_scipy():
    hyper = {"alpha": jnp.asarray(1.3), "beta": jnp.asarray(0.7)}
    rows = [1, 0, 1, 1, 0]
    stats = _stats_from_rows(lik.bb, hyper, rows)
    heads, tails = 3, 2
    np.testing.assert_allclose(
        lik.bb.marginal_loglik(hyper, stats),
        ref.bb_marginal(1.3, 0.7, heads, tails),
        rtol=1e-5,
    )
    for x in (0, 1):
        np.testing.assert_allclose(
            lik.bb.pred_logpdf(hyper, stats, jnp.asarray(x)),
            ref.bb_pred(1.3, 0.7, heads, len(rows), x),
            rtol=1e-5,
        )


def test_gp_vs_scipy():
    hyper = {"alpha": jnp.asarray(2.0), "inv_beta": jnp.asarray(1.5)}
    rows = [0, 3, 1, 7]
    stats = _stats_from_rows(lik.gp, hyper, rows)
    np.testing.assert_allclose(
        lik.gp.marginal_loglik(hyper, stats),
        ref.gp_marginal(2.0, 1.5, rows),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        lik.gp.pred_logpdf(hyper, stats, jnp.asarray(4)),
        ref.gp_pred(2.0, 1.5, rows, 4),
        rtol=1e-5,
    )


def test_nich_vs_scipy():
    h = dict(mu=0.3, kappa=1.2, sigmasq=0.8, nu=2.0)
    hyper = {k: jnp.asarray(v) for k, v in h.items()}
    rows = [0.5, -1.0, 2.2, 0.1]
    stats = _stats_from_rows(lik.nich, hyper, rows)
    np.testing.assert_allclose(
        lik.nich.marginal_loglik(hyper, stats),
        ref.nich_marginal(h["mu"], h["kappa"], h["sigmasq"], h["nu"], rows),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        lik.nich.pred_logpdf(hyper, stats, jnp.asarray(0.7)),
        ref.nich_pred(h["mu"], h["kappa"], h["sigmasq"], h["nu"], rows, 0.7),
        rtol=1e-4,
    )


def test_niw_vs_scipy():
    rng = np.random.default_rng(0)
    d = 3
    mu0 = rng.normal(size=d)
    psi = np.eye(d) + 0.2 * np.ones((d, d))
    h = dict(mu0=mu0, kappa=1.7, psi=psi, nu=d + 1.5)
    hyper = {k: jnp.asarray(v, jnp.float32) for k, v in h.items()}
    X = rng.normal(size=(6, d))
    stats = _stats_from_rows(lik.niw, hyper, list(X))
    np.testing.assert_allclose(
        lik.niw.marginal_loglik(hyper, stats),
        ref.niw_marginal(mu0, 1.7, psi, d + 1.5, X),
        rtol=2e-4,
    )
    x = rng.normal(size=d)
    np.testing.assert_allclose(
        lik.niw.pred_logpdf(hyper, stats, jnp.asarray(x, jnp.float32)),
        ref.niw_pred(mu0, 1.7, psi, d + 1.5, X, x),
        rtol=2e-4,
    )


def test_dd_vs_scipy():
    alphas = np.array([0.5, 1.0, 2.0])
    hyper = {"alphas": jnp.asarray(alphas, jnp.float32)}
    rows = [0, 2, 2, 1, 0, 2]
    stats = _stats_from_rows(lik.dd, hyper, rows)
    counts = np.bincount(rows, minlength=3)
    np.testing.assert_allclose(
        lik.dd.marginal_loglik(hyper, stats),
        ref.dd_marginal(alphas, counts),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        lik.dd.pred_logpdf(hyper, stats, jnp.asarray(1)),
        ref.dd_pred(alphas, counts, 1),
        rtol=1e-5,
    )


def test_dm_vs_scipy():
    alphas = np.array([0.5, 1.0, 2.0])
    hyper = {"alphas": jnp.asarray(alphas, jnp.float32)}
    rows = np.array([[1, 0, 2], [0, 3, 1], [2, 2, 0]], np.float32)
    stats = _stats_from_rows(lik.dm, hyper, list(rows))
    np.testing.assert_allclose(
        lik.dm.marginal_loglik(hyper, stats),
        ref.dm_marginal(alphas, rows),
        rtol=1e-5,
    )
    x = np.array([1, 1, 1], np.float32)
    np.testing.assert_allclose(
        lik.dm.pred_logpdf(hyper, stats, jnp.asarray(x)),
        ref.dm_pred(alphas, rows.sum(axis=0), x),
        rtol=1e-5,
    )


def test_bnb_vs_scipy():
    h = dict(alpha=2.0, beta=3.0, r=2.0)
    hyper = {k: jnp.asarray(v) for k, v in h.items()}
    rows = [0, 4, 2, 1]
    stats = _stats_from_rows(lik.bnb, hyper, rows)
    np.testing.assert_allclose(
        lik.bnb.marginal_loglik(hyper, stats),
        ref.bnb_marginal(2.0, 3.0, 2.0, rows),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        lik.bnb.pred_logpdf(hyper, stats, jnp.asarray(3)),
        ref.bnb_pred(2.0, 3.0, 2.0, rows, 3),
        rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# battery 2: generic conjugate self-consistency
# ---------------------------------------------------------------------------
CASES = [
    ("bb", models.bb, lambda r: r.integers(0, 2), {}),
    ("gp", models.gp, lambda r: r.poisson(3.0), {}),
    ("nich", models.nich, lambda r: r.normal(), {}),
    ("bnb", models.bnb, lambda r: r.integers(0, 6), {}),
    ("dd3", models.dd(3), lambda r: r.integers(0, 3), {}),
    (
        "dm3",
        models.dm(3),
        lambda r: r.multinomial(5, [0.3, 0.3, 0.4]).astype(np.float32),
        {},
    ),
    ("niw2", models.niw(2), lambda r: r.normal(size=2).astype(np.float32), {}),
    (
        "bbv4",
        models.bbv(4),
        lambda r: r.integers(0, 2, size=4).astype(np.float32),
        {},
    ),
]


def test_bbv_equals_d_scalar_bbs():
    """bbv(d) is exactly d independent bb columns: marginals and
    predictives must match the column-wise sum of scalar bb calls."""
    r = np.random.default_rng(3)
    d = 5
    rows = [r.integers(0, 2, size=d).astype(np.float32) for _ in range(7)]
    hv = models.bbv(d).with_hyper(
        alpha=np.linspace(0.5, 2.0, d), beta=np.linspace(1.5, 0.7, d)
    ).canonical_hyper()
    sv = _stats_from_rows(lik.bbv, hv, rows)
    x = r.integers(0, 2, size=d).astype(np.float32)

    marg_cols, pred_cols = 0.0, 0.0
    for j in range(d):
        hj = {"alpha": hv["alpha"][j], "beta": hv["beta"][j]}
        sj = _stats_from_rows(lik.bb, hj, [row[j] for row in rows])
        marg_cols += float(lik.bb.marginal_loglik(hj, sj))
        pred_cols += float(lik.bb.pred_logpdf(hj, sj, x[j]))
    np.testing.assert_allclose(
        float(lik.bbv.marginal_loglik(hv, sv)), marg_cols, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(lik.bbv.pred_logpdf(hv, sv, x)), pred_cols, rtol=1e-5
    )


def test_bbv_logpdf_batch_matmul_matches_rowwise():
    r = np.random.default_rng(5)
    d, n, k = 3, 6, 4
    X = jnp.asarray(r.integers(0, 2, size=(n, d)).astype(np.float32))
    p = jnp.asarray(r.uniform(0.1, 0.9, size=(k, d)).astype(np.float32))
    mask = jnp.ones(n)
    table = lik.bbv.logpdf_batch({"p": p}, X, mask)
    ref_tab = np.array([
        [float(lik.bbv.logpdf({"p": p[kk]}, X[i])) for kk in range(k)]
        for i in range(n)
    ])
    np.testing.assert_allclose(np.asarray(table), ref_tab, rtol=1e-5)


@pytest.mark.parametrize("name,desc,gen,_", CASES, ids=[c[0] for c in CASES])
def test_empty_marginal_is_zero(name, desc, gen, _):
    hyper = desc.canonical_hyper()
    stats = desc.likelihood.init_stats(hyper, ())
    np.testing.assert_allclose(
        desc.likelihood.marginal_loglik(hyper, stats), 0.0, atol=1e-5
    )


@pytest.mark.parametrize("name,desc,gen,_", CASES, ids=[c[0] for c in CASES])
def test_predictive_chain_rule(name, desc, gen, _):
    """marginal(D + x) - marginal(D) == pred(D, x) for every conjugate model."""
    r = np.random.default_rng(42)
    likelihood = desc.likelihood
    hyper = desc.canonical_hyper()
    rows = [gen(r) for _ in range(5)]
    stats = _stats_from_rows(likelihood, hyper, rows)
    x = jnp.asarray(gen(r))
    with_x = lik.fold(stats, likelihood.tx(hyper, x, 1.0), 1.0)
    lhs = likelihood.marginal_loglik(hyper, with_x) - likelihood.marginal_loglik(
        hyper, stats
    )
    rhs = likelihood.pred_logpdf(hyper, stats, x)
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("name,desc,gen,_", CASES, ids=[c[0] for c in CASES])
def test_batched_stats_broadcast(name, desc, gen, _):
    """pred/marginal over a [K] batch of stats == per-slot scalar calls."""
    r = np.random.default_rng(7)
    likelihood = desc.likelihood
    hyper = desc.canonical_hyper()
    K = 4
    batched = likelihood.init_stats(hyper, (K,))
    per_slot_rows = [[gen(r) for _ in range(k)] for k in range(K)]
    for k, rows in enumerate(per_slot_rows):
        for row in rows:
            tx = likelihood.tx(hyper, jnp.asarray(row), 1.0)
            batched = lik.scatter_fold(batched, k, tx, 1.0)
    x = jnp.asarray(gen(r))
    batch_pred = likelihood.pred_logpdf(hyper, batched, x)
    batch_marg = likelihood.marginal_loglik(hyper, batched)
    assert batch_pred.shape == (K,)
    for k, rows in enumerate(per_slot_rows):
        stats_k = _stats_from_rows(likelihood, hyper, rows)
        np.testing.assert_allclose(
            batch_pred[k], likelihood.pred_logpdf(hyper, stats_k, x),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            batch_marg[k], likelihood.marginal_loglik(hyper, stats_k),
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("name,desc,gen,_", CASES, ids=[c[0] for c in CASES])
def test_masked_tx_contributes_nothing(name, desc, gen, _):
    r = np.random.default_rng(3)
    likelihood = desc.likelihood
    hyper = desc.canonical_hyper()
    stats = _stats_from_rows(likelihood, hyper, [gen(r) for _ in range(3)])
    tx = likelihood.tx(hyper, jnp.asarray(gen(r)), 0.0)
    folded = lik.fold(stats, tx, 1.0)
    for a, b in zip(
        jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(folded)
    ):
        np.testing.assert_allclose(a, b)
