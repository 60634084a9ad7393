#!/usr/bin/env python
"""North-star benchmark: Gibbs sweeps/s on a large DPMM (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline: blocked (uncollapsed, truncated stick-breaking) Gibbs sweeps/s on
a 1M-row, 256-dim NIW DPMM with K_max=64 on the attached TPU — the
TPU-parallel sweep kernel (common_tpu/kernels/blocked.py).

vs_baseline: the reference (datamicroscopes) publishes no numbers
(BASELINE.md), so the baseline is its *architecture* — a per-row collapsed
Gibbs sweep (sequential rows, per-cluster NIW predictive via batched
Cholesky) implemented in vectorized numpy, measured on a row subsample and
scaled to the full N (per-row cost is N-independent).  That favors the
baseline (numpy's batched LAPACK is competitive with the reference's
per-call C++), so the ratio reported is conservative.

Usage: python bench.py [--smoke] [--n N] [--d D] [--k K] [--sweeps S]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_data(n, d, n_true, rng):
    centers = rng.normal(scale=4.0, size=(n_true, d))
    z = rng.integers(0, n_true, size=n)
    x = centers[z] + rng.normal(scale=1.0, size=(n, d))
    return x.astype(np.float32)


def bench_tpu_blocked(X, k_max, sweeps, warmup=2):
    import jax
    import jax.numpy as jnp

    from common_tpu import models
    from common_tpu import state as st
    from common_tpu.kernels import blocked

    n, d = X.shape
    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    hyper = {
        "mu0": np.zeros(d, np.float32),
        "kappa": 1.0,
        "psi": np.eye(d, dtype=np.float32),
        "nu": float(d + 2),
    }
    data = ((jnp.asarray(X), jnp.ones(n, jnp.float32)),)
    key = jax.random.key(0)
    s = st.initialize(
        defn, data, key, cluster_hp={"alpha": 1.0}, feature_hps=[hyper]
    )

    @jax.jit
    def do_sweep(state, k):
        return blocked.sweep(state, data, k)

    for i in range(warmup):
        s = do_sweep(s, jax.random.fold_in(key, i))
    jax.block_until_ready(s.counts)

    t0 = time.perf_counter()
    for i in range(sweeps):
        s = do_sweep(s, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(s.counts)
    dt = time.perf_counter() - t0
    kplus = int(np.sum(np.asarray(s.counts) > 0))
    return sweeps / dt, kplus, str(jax.devices()[0])


def numpy_collapsed_rows_per_s(X, k_init, rng, max_rows=400, budget_s=30.0):
    """Reference-architecture baseline: sequential per-row collapsed Gibbs.

    Mirrors SURVEY.md §3.2's hot loop: remove row -> score all active
    clusters + 1 empty (NIW Student-t predictive, batched Cholesky over
    clusters) -> categorical draw -> add row.  Returns measured rows/s.
    """
    n, d = X.shape
    sub = X[: min(n, max_rows)].astype(np.float64)
    m = len(sub)
    alpha = 1.0
    kappa0, nu0 = 1.0, d + 2.0
    mu0 = np.zeros(d)
    psi0 = np.eye(d)

    z = rng.integers(0, k_init, size=m)
    stats = {}
    for k in range(k_init):
        rows = sub[z == k]
        stats[k] = [len(rows), rows.sum(0), rows.T @ rows]

    from numpy.linalg import cholesky, slogdet
    from scipy.special import gammaln

    def pred_logpdf_all(x, ks):
        out = np.empty(len(ks))
        for i, k in enumerate(ks):
            cnt, sx, sxx = stats.get(k, [0, np.zeros(d), np.zeros((d, d))])
            kn = kappa0 + cnt
            nun = nu0 + cnt
            mun = (kappa0 * mu0 + sx) / kn
            psin = (
                psi0 + sxx + kappa0 * np.outer(mu0, mu0) - kn * np.outer(mun, mun)
            )
            df = nun - d + 1
            S = psin * (kn + 1) / (kn * df)
            L = cholesky(S)
            y = np.linalg.solve(L, x - mun)
            quad = y @ y
            out[i] = (
                gammaln((df + d) / 2)
                - gammaln(df / 2)
                - 0.5 * d * (np.log(df) + np.log(np.pi))
                - slogdet(S)[1] / 2
                - 0.5 * (df + d) * np.log1p(quad / df)
            )
        return out

    t0 = time.perf_counter()
    rows_done = 0
    while time.perf_counter() - t0 < budget_s:
        for i in range(m):
            xi = sub[i]
            k_old = z[i]
            st_ = stats[k_old]
            st_[0] -= 1
            st_[1] = st_[1] - xi
            st_[2] = st_[2] - np.outer(xi, xi)
            if st_[0] == 0:
                del stats[k_old]
            ks = list(stats) + [max(stats, default=-1) + 1]
            crp = np.array(
                [np.log(stats[k][0]) for k in ks[:-1]] + [np.log(alpha)]
            )
            logp = crp + pred_logpdf_all(xi, ks)
            p = np.exp(logp - logp.max())
            p /= p.sum()
            knew = ks[rng.choice(len(ks), p=p)]
            if knew not in stats:
                stats[knew] = [0, np.zeros(d), np.zeros((d, d))]
            stn = stats[knew]
            stn[0] += 1
            stn[1] = stn[1] + xi
            stn[2] = stn[2] + np.outer(xi, xi)
            z[i] = knew
            rows_done += 1
            if time.perf_counter() - t0 > budget_s and rows_done >= m:
                break
        else:
            continue
        break
    return rows_done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--sweeps", type=int, default=None)
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        n, d, k, sweeps = 20_000, 16, 16, 5
    else:
        n, d, k, sweeps = 1_000_000, 256, 64, 10
    n = args.n or n
    d = args.d or d
    k = args.k or k
    sweeps = args.sweeps or sweeps

    rng = np.random.default_rng(0)
    X = make_data(n, d, n_true=8, rng=rng)

    sweeps_per_s, kplus, device = bench_tpu_blocked(X, k, sweeps)

    if args.skip_baseline:
        base_sweeps_per_s = None
        vs = None
    else:
        budget = 5.0 if args.smoke else 30.0
        rows_per_s = numpy_collapsed_rows_per_s(
            X, k_init=8, rng=rng, budget_s=budget
        )
        base_sweeps_per_s = rows_per_s / n
        vs = sweeps_per_s / base_sweeps_per_s

    print(
        json.dumps(
            {
                "metric": f"blocked Gibbs sweeps/s, {n}x{d} DPMM-NIW K_max={k}",
                "value": round(sweeps_per_s, 4),
                "unit": "sweeps/s",
                "vs_baseline": None if vs is None else round(vs, 1),
                "baseline": "reference-architecture per-row collapsed Gibbs (numpy), scaled to full N",
                "baseline_sweeps_per_s": None
                if base_sweeps_per_s is None
                else float(f"{base_sweeps_per_s:.3e}"),
                "device": device,
                "k_active": kplus,
            }
        )
    )


if __name__ == "__main__":
    main()
