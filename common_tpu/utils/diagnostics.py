"""MCMC convergence diagnostics: ESS, split-R̂, trace summaries.

No reference analog (the reference has no diagnostics; its observability
is the joint-score trace — SURVEY.md §5.5).  These are required by the
north star (BASELINE.md: effective samples/s is a headline metric) and are
computed on-device so multi-chain diagnostics reduce over the `chains`
mesh axis without gathering traces to host.

Definitions follow Gelman et al. (BDA3) / Vehtari et al. 2021:
split-R̂ and bulk ESS via autocorrelation (Geyer initial monotone seq).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _autocov(x):
    """Autocovariance per lag via FFT; x: [T] (mean removed)."""
    t = x.shape[0]
    nfft = 2 ** int(np.ceil(np.log2(2 * t)))
    f = jnp.fft.rfft(x - jnp.mean(x), nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft)[:t].real
    return acov / t


def ess(chains) -> jax.Array:
    """Bulk effective sample size.  chains: [C, T] (or [T] for one chain).

    Uses the multi-chain variance decomposition (W, B) and Geyer's initial
    positive sequence truncation over pair sums.
    """
    x = jnp.asarray(chains, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    c, t = x.shape
    acovs = jax.vmap(_autocov)(x)  # [C, T]
    within = jnp.mean(acovs[:, 0] * t / (t - 1.0))
    mean_acov = jnp.mean(acovs, axis=0)
    chain_means = jnp.mean(x, axis=1)
    b_over_n = jnp.var(chain_means) if c > 1 else jnp.asarray(0.0)
    var_plus = within * (t - 1.0) / t + b_over_n

    rho = 1.0 - (within - mean_acov) / var_plus  # [T], rho[0] ~= 1
    # Geyer initial monotone positive sequence over pair sums
    # Γ_k = ρ_{2k} + ρ_{2k+1};  τ = -1 + 2 Σ_k Γ_k (while positive, monotone)
    tmax = t // 2
    pair = rho[0 : 2 * tmax : 2] + rho[1 : 2 * tmax : 2]  # [tmax]
    pos = jnp.cumprod((pair > 0.0).astype(jnp.float32))
    pair_mono = jax.lax.associative_scan(jnp.minimum, jnp.where(pos > 0, pair, 0.0))
    tau = jnp.maximum(-1.0 + 2.0 * jnp.sum(pair_mono * pos), 1e-3)
    return c * t / tau


def split_rhat(chains) -> jax.Array:
    """Split-R̂.  chains: [C, T]; each chain split in half → 2C sequences."""
    x = jnp.asarray(chains, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    c, t = x.shape
    half = t // 2
    x = jnp.stack([x[:, :half], x[:, half : 2 * half]], 0).reshape(2 * c, half)
    m, n = 2 * c, half
    chain_means = jnp.mean(x, axis=1)
    chain_vars = jnp.var(x, axis=1, ddof=1)
    w = jnp.mean(chain_vars)
    b = n * jnp.var(chain_means, ddof=1)
    var_plus = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def summarize_traces(score_traces) -> dict:
    """Host-side convenience: dict of ESS / R̂ / mean for [C, T] traces."""
    x = np.asarray(score_traces, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    return {
        "ess": float(ess(x)),
        "rhat": float(split_rhat(x)) if x.shape[0] > 1 else float("nan"),
        "mean": float(x.mean()),
        "std": float(x.std()),
        "nchains": int(x.shape[0]),
        "nsamples": int(x.shape[1]),
    }
