#!/usr/bin/env python
"""North-star benchmark: Gibbs sweeps/s + ESS/s on a large DPMM (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Architecture (round-3 rework — VERDICT.md round-2 items 1, 4, 5, 8):

* **Parent orchestrator / single detached TPU child.**  The axon TPU worker
  serves ONE client at a time and a client killed mid-XLA-execution wedges
  the worker for ~10 min (CLAUDE.md) — which is exactly how the round-2
  preflight poisoned its own device.  Here the parent process NEVER touches
  the TPU: it spawns one detached (setsid) child that does all TPU work and
  appends JSONL progress events to a file.  The parent polls that file with
  generous deadlines and, if the child stalls, *abandons it alive* (no
  signal is ever sent) and prints the best result received so far.  A
  wedged worker therefore costs us tiers, never the JSON line, and we never
  wedge it further.
* **Warmup outside the budget.**  The child's first action is a tiny
  matmul + host fetch.  First contact on the axon tunnel costs 100–456 s
  (measured, round 2); the measurement budget clock starts only after this
  completes, so the ladder is no longer starved by infrastructure cost.
* **Progressive ladder + eager publishing.**  Ladder tiers (up to the
  1M x 256 K=64 headline) run smallest-first with cost estimates from the
  previous tier's measured rate; after every tier the child emits a full
  best-so-far result object, so the parent always has something current.
* **Default-on extras.**  The fused-Pallas tier, a dedicated 200-sweep ESS
  tier (honest ESS/s — round-2 reported ESS>n from 5-point traces), the
  1M-doc HDP tier (config 4) and on-chip chain scaling now run in the
  default invocation, budget permitting, in priority order.  The CPU-mesh
  shard-scaling check and the numpy reference baseline run in the PARENT
  (pure-CPU work) in parallel with the child's TPU work.
* **Block-SMC tier, default-on, always last.**  The tier measures the
  block-SMC path at config-5 scale (100k rows; see kernels/smc.py).  The
  row-sequential variant that crashed the axon worker at 50k rows in
  round 2 is fenced at smc.ROW_SCAN_CAP and never runs here.

vs_baseline: the reference (datamicroscopes) publishes no numbers
(BASELINE.md), so the baseline is its *architecture* — a per-row collapsed
Gibbs sweep (sequential rows, per-cluster NIW predictive via batched
Cholesky) in vectorized numpy, measured as the median of 3 fixed-budget
replicates and scaled to the full N (per-row cost is N-independent).

Env knobs: BENCH_TOTAL_S (parent hard deadline, default 840),
BENCH_WARMUP_S (first-contact window, default 480), BENCH_BUDGET_S
(ladder budget, default 330), BENCH_FORCE_CPU=1 (no TPU child — CPU smoke
only), BENCH_CHILD_CMD (test hook: substitute child command),
BENCH_SKIP_HDP=1, BENCH_SKIP_SMC=1.

Usage: python bench.py [--smoke] [--budget-s S] [--skip-baseline] [--smc]
                       [--n N --d D --k K --sweeps S]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
import threading
import time

# before any jax import: virtual CPU devices for the parent's shard-scaling
# ladder (harmless otherwise — TPU device discovery is unaffected)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()


# ---------------------------------------------------------------------------
# best-result-so-far + safety watchdog (parent side)
# ---------------------------------------------------------------------------
# The parent does no TPU work, so it should never hang — but it does run
# CPU-backend jax (shard scaling / CPU fallback), so a last-resort daemon
# watchdog still guards the one-JSON-line contract.
_RESULT_LOCK = threading.Lock()
_RESULT = {
    "metric": "blocked Gibbs sweeps/s (no tier completed)",
    "value": None,
    "unit": "sweeps/s",
    "vs_baseline": None,
}
_DONE = threading.Event()


def _publish(result):
    with _RESULT_LOCK:
        _RESULT.clear()
        # deep-copy so the watchdog never serializes a dict being mutated
        # by the main thread (ADVICE.md round 2)
        _RESULT.update(copy.deepcopy(result))


# Keys whose values ARE the headline.  The driver's official record keeps
# only the LAST 4 KB of output (round-3 VERDICT item 3: BENCH_r03's tail
# started mid-`tiers` and the metric/value fields were cut off), so the
# final JSON line is ordered bulky-first / headline-LAST, with a compact
# `summary` of every sub-tier just before the headline scalars — any tail
# window that survives truncation then contains the numbers that matter.
_TAIL_KEYS = (
    "summary", "partial", "total_s", "baseline_sweeps_per_s",
    "baseline_range", "ess_per_s", "ess_per_s_spread", "k_active",
    "tflops",
    "mfu_vs_bf16_peak", "device", "vs_baseline", "unit", "value", "metric",
)


def _compact_summary(result):
    """One-liners of every sub-tier (fits comfortably in a 4 KB tail)."""
    s = {}

    def g(d, *ks):
        for k in ks:
            d = d.get(k) if isinstance(d, dict) else None
        return d

    if result.get("ess_tier"):
        t = result["ess_tier"]
        s["ess"] = {
            "shape": [t.get("n"), t.get("d"), t.get("k_max")],
            "sweeps": t.get("sweeps"),
            "n_seeds": t.get("n_seeds"),
            "ess_per_s": t.get("ess_per_s"),
            "spread": t.get("ess_per_s_spread"),
            "kernel": t.get("kernel"),
        }
        if t.get("stalled_seeds"):
            s["ess"]["stalled_seeds"] = t["stalled_seeds"]
        if t.get("seeds_truncated"):
            s["ess"]["seeds_truncated"] = True
    if result.get("predictive"):
        s["predictive"] = result["predictive"]
    if result.get("hdp"):
        h = result["hdp"]
        s["hdp"] = {
            "tokens_per_s": h.get("tokens_per_s"),
            "perplexity": g(h, "predictive", "perplexity"),
        }
    if result.get("smc"):
        m = result["smc"]
        s["smc"] = {
            "n": m.get("n"), "d": m.get("d"),
            "particles": m.get("particles"),
            "rows_per_s": m.get("rows_per_s"), "logz": m.get("logz"),
            "logz_degenerate": g(m, "logz_health", "logz_degenerate"),
            "heldout_logp_dim": g(m, "predictive", "per_dim"),
        }
    for cfg in ("config2", "config3"):
        c = g(result, "configs", cfg)
        if c:
            s[cfg] = {
                "sweeps_per_s": c.get("sweeps_per_s"),
                "fused_sweeps_per_s": g(c, "fused", "sweeps_per_s"),
                "predictive": g(c, "predictive", "mean_logp"),
            }
            s[cfg] = {k: v for k, v in s[cfg].items() if v is not None}
    eff = result.get("efficiency")
    if eff:
        s["efficiency"] = {
            "cpu_mesh_collectives_ok": g(
                eff, "cpu_mesh_shards", "collectives_ok"
            ),
            "chains_on_chip": g(eff, "chains_on_chip", "efficiency"),
        }
    ft = result.get("fused_tier")
    if ft:
        s["fused"] = {"sweeps_per_s": ft.get("sweeps_per_s")}
    ch = result.get("chains_headline")
    if ch:
        s["chains_headline"] = {
            c: v.get("aggregate_chain_sweeps_per_s")
            for c, v in (ch.get("chains") or {}).items()
        }
        s["chains_headline"]["vs_single"] = ch.get("vs_single_chain")
    sm = result.get("ess_tier_sm")
    if sm:
        s["ess_sm"] = {
            "ess_per_s": sm.get("ess_per_s"),
            "spread": sm.get("ess_per_s_spread"),
            "vs_plain": sm.get("ab_plain_ess_per_s"),
        }
    return s


def _ordered_for_tail(result):
    """Reorder so the headline scalars are the FINAL dict entries."""
    out = {k: v for k, v in result.items() if k not in _TAIL_KEYS}
    out["summary"] = _compact_summary(result)
    for k in _TAIL_KEYS:
        if k == "summary":
            continue
        if k in result:
            out[k] = result[k]
    return out


def _merge(**fields):
    with _RESULT_LOCK:
        _RESULT.update(copy.deepcopy(fields))


def _start_watchdog(fire_at_monotonic):
    def run():
        while not _DONE.is_set():
            left = fire_at_monotonic - time.monotonic()
            if left <= 0:
                break
            _DONE.wait(min(left, 5.0))
        if _DONE.is_set():
            return
        with _RESULT_LOCK:
            out = copy.deepcopy(_RESULT)
        out["watchdog_timeout"] = True
        print(json.dumps(_ordered_for_tail(out)), flush=True)
        os._exit(0)

    t = threading.Thread(target=run, daemon=True, name="bench-watchdog")
    t.start()
    return t


# ---------------------------------------------------------------------------
# measurement pieces (these run inside whichever process calls them)
# ---------------------------------------------------------------------------
def make_data_device(key, n, d, n_true=8):
    """Synthesize a Gaussian-mixture row block on the device (jitted)."""
    import jax
    import jax.numpy as jnp

    kc, kz, kn = jax.random.split(key, 3)
    centers = 4.0 * jax.random.normal(kc, (n_true, d), jnp.float32)
    z = jax.random.randint(kz, (n,), 0, n_true)
    x = centers[z] + jax.random.normal(kn, (n, d), jnp.float32)
    return x


def _fetch(arr):
    """Host fetch = the only true execution fence on the axon backend."""
    import numpy as np

    return np.asarray(arr)


def build_tier_fn(n, d, k_max, sweeps, kernel="blocked", heldout=0,
                  multi_stat=False):
    """Compiled (datagen → init → S sweeps + score trace) programs.

    kernel: "blocked" (XLA path) or "fused" (Pallas score+Gumbel+argmax
    kernel — the [N, K] table never touches HBM).

    heldout > 0 additionally generates `heldout` rows from the SAME
    mixture (same centers — one datagen call over n+heldout rows, then a
    split) for posterior-predictive quality scoring; the timed `run`
    program is unchanged.

    multi_stat=True makes the per-sweep trace a [sweeps, 2] stack of
    (score_joint, k_active) instead of the score scalar — the ESS tier
    estimates ESS per statistic and keeps the conservative minimum
    (round-4 VERDICT next #2: score-only ESS was the sole evidence)."""
    import jax
    import jax.numpy as jnp

    from common_tpu import models
    from common_tpu import state as st
    from common_tpu.kernels import blocked

    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    hyper = {
        "mu0": jnp.zeros(d, jnp.float32),
        "kappa": 1.0,
        "psi": jnp.eye(d, dtype=jnp.float32),
        "nu": float(d + 2),
    }

    def setup(key):
        x_all = make_data_device(jax.random.fold_in(key, 0), n + heldout, d)
        x, xh = x_all[:n], x_all[n:]
        data = ((x, jnp.ones(n, jnp.float32)),)
        s = st.initialize(
            defn,
            data,
            jax.random.fold_in(key, 1),
            cluster_hp={"alpha": 1.0},
            feature_hps=[hyper],
        )
        return x, xh, s

    def run(x, s, key):
        data = ((x, jnp.ones(n, jnp.float32)),)

        def body(state, t):
            kt = jax.random.fold_in(key, t)
            if kernel in ("fused", "fused+sm"):
                # k_tile=24 measured +1.7% over the round-3 default 16 at
                # the 1M x 256 K=64 headline (5.55 vs 5.46 sweeps/s,
                # 3-rep A/B); 32 exceeds v5e scoped VMEM
                state = blocked.sweep_fused(state, data, kt, k_tile=24)
            else:
                state = blocked.sweep(state, data, kt)
            if kernel == "fused+sm":
                # Jain-Neal split-merge chaser (kernels/splitmerge.py):
                # the ESS/s A/B arm — per-sweep cost is a few [N, 2]
                # passes vs the sweep's [N, K], bought for cluster-level
                # moves single-site sweeps cannot make
                from common_tpu.kernels import splitmerge

                state = splitmerge.moves(
                    state, data, jax.random.fold_in(kt, 1),
                    n_moves=2, t_scans=3,
                )
            score = st.score_joint(state)
            if multi_stat:
                k_act = jnp.sum(state.counts > 0).astype(jnp.float32)
                return state, jnp.stack([score, k_act])
            return state, score

        s, trace = jax.lax.scan(body, s, jnp.arange(sweeps))
        return s, trace

    return jax.jit(setup), jax.jit(run)


def _capped_ess(trace, n_samples):
    """Bulk ESS capped at the sample count (an autocovariance estimator fed
    a handful of points can report ESS > n — round-2 weak item 3).

    Traces shorter than 20 samples return None: the estimator carries no
    information there and the capped value just parrots the sweep count
    (round-3 weak item 6).  The first 20% of the trace is discarded as
    burn-in before estimating (standard practice: the convergence
    transient otherwise reads as autocorrelation and deflates ESS);
    callers divide by the FULL run time, so ess_per_s stays conservative.
    """
    import numpy as np

    from common_tpu.utils import diagnostics

    if n_samples < 20:
        return None
    kept = trace[int(0.2 * len(trace)):]
    e = float(diagnostics.ess(kept - kept.mean()))
    if not np.isfinite(e):
        return None
    return min(e, float(len(kept)))


def run_tier(n, d, k_max, sweeps, key, kernel="blocked", heldout=0):
    """Returns a dict of tier measurements (raises on failure/OOM).

    heldout > 0 appends a `predictive` block: mean posterior-predictive
    log-lik of `heldout` same-mixture rows under the final state (the
    BASELINE quality metric), computed OUTSIDE the timed region."""
    import jax
    import numpy as np

    setup, run = build_tier_fn(n, d, k_max, sweeps, kernel, heldout)

    t0 = time.perf_counter()
    x, xh, s = setup(key)
    _fetch(s.counts)
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = run.lower(x, s, key).compile()
    compile_s = time.perf_counter() - t0

    # Warm-up execution: the first run of a compiled program pays one-time
    # buffer/layout costs; and on the axon backend block_until_ready does
    # NOT wait for execution — only a literal host fetch does.
    s_out, trace = compiled(x, s, key)
    _fetch(s_out.counts)

    t0 = time.perf_counter()
    s_out, trace = compiled(x, s, key)
    _fetch(s_out.counts)
    dt = time.perf_counter() - t0

    trace = np.asarray(trace, np.float64)
    ess_est = _capped_ess(trace, sweeps)
    ess_per_s = None if ess_est is None else ess_est / dt

    flops_per_sweep = 4.0 * n * k_max * d * d  # score [N,K] + suffstat rebuild
    tflops = flops_per_sweep * sweeps / dt / 1e12

    predictive = None
    if heldout:
        import jax.numpy as jnp

        from common_tpu import state as st

        @jax.jit
        def held_lp(state, xh):
            lp = st.heldout_logp(
                state, ((xh, jnp.ones(xh.shape[0], jnp.float32)),)
            )
            return jnp.mean(lp)

        mean_lp = float(_fetch(held_lp(s_out, xh)))
        predictive = {
            "heldout_rows": heldout,
            "mean_logp": round(mean_lp, 4),
            "per_dim": round(mean_lp / d, 5),
        }

    return {
        "n": n,
        "d": d,
        "k_max": k_max,
        "kernel": kernel,
        "sweeps": sweeps,
        "sweeps_per_s": sweeps / dt,
        "run_s": dt,
        "compile_s": compile_s,
        "setup_s": setup_s,
        "ess_est": None if ess_est is None else round(ess_est, 2),
        "ess_per_s": None if ess_per_s is None else round(ess_per_s, 4),
        "tflops": round(tflops, 2),
        "mfu_vs_bf16_peak": round(tflops / 197.0, 4),
        "k_active": int(np.sum(_fetch(s_out.counts) > 0)),
        "score_final": float(trace[-1]),
        "predictive": predictive,
    }


def _mark_stalled_seeds(seeds_out):
    """Mark tunnel-stalled seeds in place; return the kept (clean) ones.

    Wall time wildly above the fastest seed's for the SAME compiled
    program is an axon tunnel/worker stall, not sampler behavior
    (round-5 incident: 558 s vs ~54 s for an identical 300-sweep scan).
    Thresholds: > 3x the fastest AND > 60 s over it, so ordinary ~30%
    tunnel jitter and small-shape noise never trigger it.
    """
    best_rs = min(so["run_s"] for so in seeds_out) if seeds_out else None
    for so in seeds_out:
        so["stalled"] = bool(
            best_rs is not None
            and so["run_s"] > 3.0 * best_rs
            and so["run_s"] - best_rs > 60.0
        )
    return [so for so in seeds_out if not so["stalled"]]


def run_ess_tier(n, d, k_max, key, sweeps=300, n_seeds=2,
                 kernel="fused", heldout=4096, deadline=None):
    """North-star ESS/s with quantified uncertainty (VERDICT r04 next #2).

    n_seeds independent chains (fresh data + init per seed), each a
    `sweeps`-sweep compiled scan recording (score_joint, k_active) per
    sweep.  Per seed: Geyer ESS per statistic (20% burn-in discard,
    capped at the kept length), conservative min across statistics,
    divided by that seed's full wall time.  Published: mean ± spread of
    ess_per_s over seeds.  Round 4's headline rested on ONE 100-sweep
    trace whose own ESS was ~4 (O(100%) estimator variance; a same-shape
    rehearsal read 4× apart).

    Tunnel-stall robustness (round-5 incident: one seed of three took
    558 s wall for a program the other two ran in ~54 s — a ~500 s axon
    worker stall mid-execution, which both dragged the published mean
    4× low and starved every downstream tier): (a) a seed whose wall
    time is > 3× the fastest seed's (and > 60 s over it) is marked
    `stalled` and excluded from the published mean/spread — its raw
    numbers stay in `seeds` for audit; (b) if `deadline` (a
    time.monotonic() value) passes, remaining seeds are skipped and
    `seeds_truncated` records it, so one stall cannot eat the whole
    extras window."""
    import jax
    import numpy as np

    setup, run = build_tier_fn(n, d, k_max, sweeps, kernel, heldout,
                               multi_stat=True)

    t0 = time.perf_counter()
    x, xh, s = setup(jax.random.fold_in(key, 0))
    _fetch(s.counts)
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = run.lower(x, s, key).compile()
    compile_s = time.perf_counter() - t0

    seeds_out = []
    s_out = None
    seeds_truncated = False
    for i in range(n_seeds):
        if deadline is not None and i > 0 and time.monotonic() > deadline:
            seeds_truncated = True
            break
        ki = jax.random.fold_in(key, 100 + i)
        if i > 0:
            x, xh, s = setup(ki)
            _fetch(s.counts)
        # no discarded warm run: the first execution's one-time buffer
        # costs land in seed 0's timing (conservative); the cross-seed
        # spread makes any such inflation visible
        t0 = time.perf_counter()
        s_out, trace = compiled(x, s, ki)
        _fetch(s_out.counts)
        dt = time.perf_counter() - t0
        trace = np.asarray(trace, np.float64)          # [sweeps, 2]
        stats = {"score_joint": trace[:, 0], "k_active": trace[:, 1]}
        ess_by_stat = {}
        for name, tr in stats.items():
            if np.ptp(tr) == 0.0:
                # a constant trace (e.g. k_active pinned) carries no
                # autocorrelation information — exclude, don't fake
                ess_by_stat[name] = None
                continue
            ess_by_stat[name] = _capped_ess(tr, sweeps)
        finite = [v for v in ess_by_stat.values() if v is not None]
        ess_min = min(finite) if finite else None
        seeds_out.append({
            "run_s": round(dt, 2),
            "sweeps_per_s": round(sweeps / dt, 4),
            "ess_by_stat": {
                k: (None if v is None else round(v, 2))
                for k, v in ess_by_stat.items()
            },
            "ess_min": None if ess_min is None else round(ess_min, 2),
            "ess_per_s": None if ess_min is None
            else round(ess_min / dt, 4),
            "k_active": int(np.sum(_fetch(s_out.counts) > 0)),
            "score_final": float(trace[-1, 0]),
        })

    kept = _mark_stalled_seeds(seeds_out)
    vals = [so["ess_per_s"] for so in kept
            if so["ess_per_s"] is not None]
    ess_per_s = round(float(np.mean(vals)), 4) if vals else None
    spread = (round(float(max(vals) - min(vals)), 4)
              if len(vals) > 1 else None)

    predictive = None
    if heldout and s_out is not None:
        import jax.numpy as jnp

        from common_tpu import state as st

        @jax.jit
        def held_lp(state, xh):
            lp = st.heldout_logp(
                state, ((xh, jnp.ones(xh.shape[0], jnp.float32)),)
            )
            return jnp.mean(lp)

        mean_lp = float(_fetch(held_lp(s_out, xh)))
        predictive = {
            "heldout_rows": heldout,
            "mean_logp": round(mean_lp, 4),
            "per_dim": round(mean_lp / d, 5),
        }

    anchor = kept if kept else seeds_out
    mean_dt = float(np.mean([so["run_s"] for so in anchor]))
    return {
        "n": n, "d": d, "k_max": k_max, "kernel": kernel,
        "sweeps": sweeps, "n_seeds": n_seeds,
        "sweeps_per_s": round(sweeps / mean_dt, 4),
        "compile_s": round(compile_s, 1),
        "setup_s": round(setup_s, 1),
        "seeds": seeds_out,
        "stalled_seeds": sum(so["stalled"] for so in seeds_out),
        "seeds_truncated": seeds_truncated,
        "ess_per_s": ess_per_s,
        "ess_per_s_spread": spread,
        "ess_est": anchor[-1]["ess_min"] if anchor else None,
        "k_active": anchor[-1]["k_active"] if anchor else None,
        "score_final": anchor[-1]["score_final"] if anchor else None,
        "predictive": predictive,
    }


def run_chain_scaling_tier(key, n=65536, d=16, k_max=16, sweeps=40,
                           chain_counts=(1, 2, 4), repeats=3):
    """On-chip chain scaling: C independent chains on ONE device.

    The >= 0.8 multi-host efficiency north star cannot be measured on a
    1-chip box; this is the single-chip proxy (BASELINE.md): total
    chain-sweeps/s at C = 1, 2, 4 chains at fixed per-chain work.
    Perfect scaling doubles total throughput per doubling until the chip
    saturates.

    Uses `blocked.sweep_chains` (round-3 VERDICT item 2): the naive
    vmapped sweep issues C·K tiny [N, D] @ [D, D] matmuls, whose MXU
    waste froze scaling at 0.43 efficiency; sweep_chains folds the chain
    axis into the matmul K-dimension (two wide matmuls over shared
    [N, D²] features) so per-chain work batches properly.
    """
    import jax
    import jax.numpy as jnp

    from common_tpu import models
    from common_tpu import state as st
    from common_tpu.kernels import blocked

    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    hyper = {
        "mu0": jnp.zeros(d, jnp.float32),
        "kappa": 1.0,
        "psi": jnp.eye(d, dtype=jnp.float32),
        "nu": float(d + 2),
    }
    x = make_data_device(jax.random.fold_in(key, 0), n, d)
    data = ((x, jnp.ones(n, jnp.float32)),)

    throughput = {}
    for c in chain_counts:
        def init_one(k):
            return st.initialize(
                defn, data, k, cluster_hp={"alpha": 1.0},
                feature_hps=[hyper],
            )

        states = jax.jit(jax.vmap(init_one))(
            jax.random.split(jax.random.fold_in(key, c), c)
        )

        def run(states, data, key):
            def body(ss, t):
                ss = blocked.sweep_chains(
                    ss, data, jax.random.fold_in(key, t)
                )
                return ss, None

            ss, _ = jax.lax.scan(body, states, jnp.arange(sweeps))
            return ss

        compiled = jax.jit(run).lower(states, data, key).compile()
        out = compiled(states, data, key)
        _fetch(out.counts)
        # median-of-repeats: single timed dispatches over the axon tunnel
        # jitter by ~30% (measured round 4), which swings the C=1 anchor
        # and therefore the efficiency ratio
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = compiled(states, data, key)
            _fetch(out.counts)
            times.append(time.perf_counter() - t0)
        times.sort()
        throughput[c] = c * sweeps / times[len(times) // 2]

    cs = sorted(chain_counts)
    lo, hi = cs[0], cs[-1]
    # per-sweep cost model t(C) = latency + per_chain*C (least squares):
    # the measured ceiling story (BENCH_NOTES.md "Chain scaling") — the
    # wide-matmul sweep leaves the MXU idle, but the per-chain
    # elementwise [N, K] passes (logp assembly, Gumbel, argmax, onehot)
    # are VPU/HBM work that scales with C.
    import numpy as np

    t_per_sweep = {c: c * sweeps / throughput[c] / sweeps * 1e3
                   for c in cs}  # ms
    A = np.stack([np.ones(len(cs)), np.asarray(cs, float)], axis=1)
    (lat_ms, per_chain_ms), *_ = np.linalg.lstsq(
        A, np.asarray([t_per_sweep[c] for c in cs]), rcond=None
    )
    return {
        "mode": "sweep_chains (wide-matmul chain batching), one chip",
        "n": n, "d": d, "k_max": k_max, "sweeps": sweeps,
        "chain_sweeps_per_s": {str(c): round(v, 2)
                               for c, v in throughput.items()},
        "efficiency": round((throughput[hi] / throughput[lo]) / (hi / lo), 4),
        "sweep_ms_model": {
            "latency_ms": round(float(lat_ms), 3),
            "per_chain_ms": round(float(per_chain_ms), 3),
            "note": "t(C) ~ latency + per_chain*C; includes ~8 ms axon "
                    "dispatch amortized over the scan",
        },
    }


def run_chains_headline_tier(key, n, d, k_max, chain_counts=(4,),
                             sweeps=5, repeats=3):
    """Multi-chain throughput AT THE HEADLINE SHAPE (VERDICT r04 next #5,
    promoted from builder notes into the official record).

    C independent chains vmapped over the per-chain XLA blocked sweep —
    the MEASURED winner at d=256 (BENCH_NOTES round 5 "Multi-chain at
    the 1M×256 headline"): vmapped XLA beats the Pallas chains kernel at
    every C (5.97 vs 5.63 aggregate chain-sweeps/s at C=4), and C=4 is
    the first multi-chain configuration to beat the tuned single-chain
    fused kernel (5.52, +8%).  `sweep_chains` dispatches to the vmapped
    path itself at this shape (the [N, D²] wide-matmul features are over
    budget), so this tier exercises the production entry point.
    """
    import jax
    import jax.numpy as jnp

    from common_tpu import models
    from common_tpu import state as st
    from common_tpu.kernels import blocked

    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    hyper = {
        "mu0": jnp.zeros(d, jnp.float32),
        "kappa": 1.0,
        "psi": jnp.eye(d, dtype=jnp.float32),
        "nu": float(d + 2),
    }
    x = make_data_device(jax.random.fold_in(key, 0), n, d)
    data = ((x, jnp.ones(n, jnp.float32)),)

    out_by_c = {}
    for c in chain_counts:
        def init_one(k):
            return st.initialize(
                defn, data, k, cluster_hp={"alpha": 1.0},
                feature_hps=[hyper],
            )

        states = jax.jit(jax.vmap(init_one))(
            jax.random.split(jax.random.fold_in(key, c), c)
        )

        def run(states, data, key):
            def body(ss, t):
                ss = blocked.sweep_chains(
                    ss, data, jax.random.fold_in(key, t)
                )
                return ss, None

            ss, _ = jax.lax.scan(body, states, jnp.arange(sweeps))
            return ss

        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(states, data, key).compile()
        compile_s = time.perf_counter() - t0
        out = compiled(states, data, key)
        _fetch(out.counts)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = compiled(states, data, key)
            _fetch(out.counts)
            times.append(time.perf_counter() - t0)
        times.sort()
        agg = c * sweeps / times[len(times) // 2]
        out_by_c[str(c)] = {
            "aggregate_chain_sweeps_per_s": round(agg, 3),
            "per_chain_sweeps_per_s": round(agg / c, 3),
            "compile_s": round(compile_s, 1),
            "k_active_per_chain": [
                int(v) for v in (_fetch(out.counts) > 0).sum(-1)
            ],
        }

    return {
        "mode": "vmapped XLA per-chain sweeps via sweep_chains "
                "(measured winner at d=256; Pallas chains kernel slower "
                "- BENCH_NOTES round 5)",
        "n": n, "d": d, "k_max": k_max, "sweeps": sweeps,
        "chains": out_by_c,
    }


def run_config2_tier(key, n=100_000, d=64, k_max=32, sweeps=8,
                     heldout=4096, fused=True):
    """BASELINE config 2: Beta-Bernoulli DPMM on an [n, d] binary feature
    matrix (one bbv vector feature = the reference's d scalar bb columns),
    blocked assignment sweep + coordinate-wise slice sampling of the
    per-column (alpha, beta) hypers and the CRP concentration, as one
    compiled scan.

    Also times the fused-Pallas bbv variant (`sweep_fused` →
    ops/linear_assign.py) of the same scan — round-3 weak item 3: the
    fused bbv kernel previously had no measured TPU number — and scores
    `heldout` same-mixture rows under the final state (BASELINE
    predictive-quality metric)."""
    import jax
    import jax.numpy as jnp

    from common_tpu import models, scalar_functions
    from common_tpu import state as st
    from common_tpu.kernels import blocked, slice_

    defn = st.model_definition(n, [models.bbv(d)], k_max=k_max)

    @jax.jit
    def gen(k):
        kp, kz, kx = jax.random.split(k, 3)
        probs = jax.random.beta(kp, 0.5, 0.5, (8, d))
        z = jax.random.randint(kz, (n + heldout,), 0, 8)
        return jax.random.bernoulli(kx, probs[z]).astype(jnp.float32)

    x_all = gen(jax.random.fold_in(key, 0))
    x, xh = x_all[:n], x_all[n:]
    data = ((x, jnp.ones(n, jnp.float32)),)
    state = st.initialize(
        defn, data, jax.random.fold_in(key, 1),
        cluster_hp={"alpha": 1.0},
        feature_hps=[{"alpha": jnp.ones(d), "beta": jnp.ones(d)}],
    )
    # moderate bounds: with the *uncollapsed* sweep, slice-adapted
    # per-column hypers below ~0.5 make empty-slot prior draws extreme
    # (p ≈ 0/1 patterns) and the truncated sampler collapses to one
    # cluster — bounded hypers keep cluster-seeding draws moderate
    specs = {0: {
        "alpha": {"prior": scalar_functions.log_exponential(1.0),
                  "w": 0.5, "bounds": (0.5, 50.0)},
        "beta": {"prior": scalar_functions.log_exponential(1.0),
                 "w": 0.5, "bounds": (0.5, 50.0)},
    }}
    cluster = {"prior": scalar_functions.log_exponential(1.0),
               "w": 0.5, "bounds": (1e-4, 1e4)}

    def make_run(sweep_fn):
        def run(state, data, key):
            def body(s, t):
                kt = jax.random.fold_in(key, t)
                s = sweep_fn(s, data, jax.random.fold_in(kt, 0))
                s = slice_._hp_impl(s, jax.random.fold_in(kt, 1),
                                    specs=specs, cluster=cluster)
                return s, st.score_joint(s)

            return jax.lax.scan(body, state, jnp.arange(sweeps))

        return run

    def time_variant(sweep_fn, kv):
        t0 = time.perf_counter()
        compiled = jax.jit(make_run(sweep_fn)).lower(
            state, data, kv
        ).compile()
        compile_s = time.perf_counter() - t0
        out, trace = compiled(state, data, kv)
        _fetch(out.counts)
        t0 = time.perf_counter()
        out, trace = compiled(state, data, kv)
        _fetch(out.counts)
        dt = time.perf_counter() - t0
        return out, trace, dt, compile_s

    import numpy as np

    out, trace, dt, compile_s = time_variant(
        blocked.sweep, jax.random.fold_in(key, 2)
    )
    result = {
        "config": "2: bb-dpmm + slice hp",
        "n": n, "d": d, "k_max": k_max, "sweeps": sweeps,
        "sweeps_per_s": round(sweeps / dt, 3),
        "compile_s": round(compile_s, 1),
        "k_active": int(np.sum(_fetch(out.counts) > 0)),
        "alpha": float(_fetch(out.cluster_hp["alpha"])),
        "score_final": float(np.asarray(trace)[-1]),
    }

    # fused-Pallas bbv variant of the identical scan.  Measured round 4
    # on the real TPU: 47.9 vs 84.3 sweeps/s — the fused kernel LOSES at
    # this shape (the bbv score is one [N,64] @ [64,32] matmul XLA
    # already fuses optimally; the Pallas per-tile PRNG overhead has no
    # [N,K]-traffic saving to pay for it) and its axon remote compile
    # cost 255 s.  It stays measurable (fused=True) so the record can
    # carry the honest number when the budget window affords the
    # compile; callers pass fused=False under tight windows.
    if fused:
        try:
            fout, ftrace, fdt, fcompile = time_variant(
                blocked.sweep_fused, jax.random.fold_in(key, 2)
            )
            result["fused"] = {
                "sweeps_per_s": round(sweeps / fdt, 3),
                "compile_s": round(fcompile, 1),
                "k_active": int(np.sum(_fetch(fout.counts) > 0)),
                "score_final": float(np.asarray(ftrace)[-1]),
                "speedup_vs_xla": round(dt / fdt, 3),
            }
            # NOTE: `out` deliberately stays the XLA run's state — the
            # top-level k_active/score_final/alpha fields describe the
            # XLA chain, so the predictive below must score the same
            # chain (round-4 ADVICE: the old `out = fout` swap silently
            # mixed two different chains in one record).
        except Exception as e:
            result["fused"] = {"error": repr(e)}
    else:
        result["fused"] = {
            "skipped": "budget window below the ~255 s measured axon "
                       "compile cost; see BENCH_NOTES.md round 4 "
                       "(measured: fused 47.9 vs XLA 84.3 sweeps/s — "
                       "XLA wins at this shape)"
        }

    if heldout:
        @jax.jit
        def held_lp(state, xh):
            lp = st.heldout_logp(
                state, ((xh, jnp.ones(xh.shape[0], jnp.float32)),)
            )
            return jnp.mean(lp)

        mean_lp = float(_fetch(held_lp(out, xh)))
        result["predictive"] = {
            "heldout_rows": heldout,
            "mean_logp": round(mean_lp, 4),
            "per_dim": round(mean_lp / d, 5),
        }
    return result


def run_config3_tier(key, n=100_000, k_max=32, sweeps=4):
    """BASELINE config 3: mixed-likelihood DPMM (NIW + GammaPoisson +
    BetaBernoulli columns) with NUTS on the non-conjugate hyperpriors,
    one compiled scan of (blocked sweep + NUTS hp + NUTS cluster_hp)."""
    import jax
    import jax.numpy as jnp

    from common_tpu import models, scalar_functions
    from common_tpu import state as st
    from common_tpu.kernels import blocked, hmc

    d_niw, d_bin = 16, 16
    defn = st.model_definition(
        n, [models.niw(d_niw), models.gp, models.bb], k_max=k_max
    )

    @jax.jit
    def gen(k):
        kx, kc, kp, kb = jax.random.split(k, 4)
        nh = n + 2048  # trailing 2048 rows held out (same mixture)
        z = jax.random.randint(kc, (nh,), 0, 8)
        centers = 4.0 * jax.random.normal(
            jax.random.fold_in(kc, 1), (8, d_niw)
        )
        xg = centers[z] + jax.random.normal(kx, (nh, d_niw))
        rates = jnp.exp(jax.random.normal(jax.random.fold_in(kp, 1), (8,)))
        xp = jax.random.poisson(kp, rates[z], (nh,)).astype(jnp.float32)
        pb = jax.random.beta(jax.random.fold_in(kb, 1), 0.5, 0.5, (8,))
        xb = jax.random.bernoulli(kb, pb[z], (nh,)).astype(jnp.float32)
        return xg, xp, xb

    xg, xp, xb = gen(jax.random.fold_in(key, 0))
    xg, xg_h = xg[:n], xg[n:]
    xp, xp_h = xp[:n], xp[n:]
    xb, xb_h = xb[:n], xb[n:]
    ones = jnp.ones(n, jnp.float32)
    data = ((xg, ones), (xp, ones), (xb, ones))
    state = st.initialize(
        defn, data, jax.random.fold_in(key, 1),
        cluster_hp={"alpha": 1.0},
        feature_hps=[
            {"mu0": jnp.zeros(d_niw), "kappa": 1.0,
             "psi": jnp.eye(d_niw), "nu": float(d_niw + 2)},
            {"alpha": 1.0, "inv_beta": 1.0},
            {"alpha": 1.0, "beta": 1.0},
        ],
    )
    exp1 = scalar_functions.log_exponential(1.0)
    priors = {
        1: lambda h: exp1(h["alpha"]) + exp1(h["inv_beta"]),
        2: lambda h: exp1(h["alpha"]) + exp1(h["beta"]),
    }

    def run(state, data, key):
        def body(s, t):
            kt = jax.random.fold_in(key, t)
            s = blocked.sweep(s, data, jax.random.fold_in(kt, 0))
            s = hmc.hp(s, data, jax.random.fold_in(kt, 1), priors,
                       num_steps=2, max_depth=5)
            s = hmc.cluster_hp(s, jax.random.fold_in(kt, 2), exp1,
                               num_steps=2, max_depth=5)
            return s, st.score_joint(s)

        return jax.lax.scan(body, state, jnp.arange(sweeps))

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(state, data, jax.random.key(3)).compile()
    compile_s = time.perf_counter() - t0
    out, trace = compiled(state, data, jax.random.fold_in(key, 2))
    _fetch(out.counts)
    t0 = time.perf_counter()
    out, trace = compiled(state, data, jax.random.fold_in(key, 2))
    _fetch(out.counts)
    dt = time.perf_counter() - t0
    import numpy as np

    # held-out predictive on 2048 same-mixture rows (round-5: config 3
    # gets the same quality metric config 2 carries)
    predictive = None
    try:
        h = xg_h.shape[0]
        ones_h = jnp.ones(h, jnp.float32)
        held_data = ((xg_h, ones_h), (xp_h, ones_h), (xb_h, ones_h))

        @jax.jit
        def held_lp(state):
            return jnp.mean(st.heldout_logp(state, held_data))

        mean_lp = float(_fetch(held_lp(out)))
        predictive = {"heldout_rows": int(h),
                      "mean_logp": round(mean_lp, 4)}
    except Exception as e:
        predictive = {"error": repr(e)}

    return {
        "config": "3: mixed niw+gp+bb + NUTS hp",
        "n": n, "features": ["niw16", "gp", "bb"], "k_max": k_max,
        "sweeps": sweeps,
        "sweeps_per_s": round(sweeps / dt, 3),
        "compile_s": round(compile_s, 1),
        "k_active": int(np.sum(_fetch(out.counts) > 0)),
        "score_final": float(np.asarray(trace)[-1]),
        "alpha": float(_fetch(out.cluster_hp["alpha"])),
        "predictive": predictive,
    }


def run_hdp_tier(n_docs, doc_len, k_topics, vocab, sweeps, key,
                 doc_chunk=20_000, heldout_frac=0.01):
    """Config-4 scale: HDP-LDA blocked sweeps/s on an n_docs-doc corpus.

    Synthetic corpus generated on-device (equal-length docs, topic-block
    vocab); one compiled scan of `sweeps` (dense doc-major blocked sweep
    + beta resample) is timed; reports sweeps/s and tokens/s.

    heldout_frac > 0 masks that fraction of token POSITIONS out of
    training (document-completion style) and reports their per-token
    perplexity under the trained state (BASELINE predictive-quality
    metric), computed outside the timed region.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from common_tpu import topic

    T = n_docs * doc_len
    kb = 4  # true topic blocks

    @jax.jit
    def gen(key):
        topic_of_doc = jnp.arange(n_docs, dtype=jnp.int32) % kb
        block = vocab // kb
        w = topic_of_doc[:, None] * block + jax.random.randint(
            key, (n_docs, doc_len), 0, block, jnp.int32
        )
        held = (
            jax.random.uniform(jax.random.fold_in(key, 1),
                               (n_docs, doc_len)) < heldout_frac
        ).astype(jnp.float32)
        return w, held

    words, held = gen(jax.random.fold_in(key, 0))
    mask = 1.0 - held if heldout_frac > 0 else jnp.ones(
        (n_docs, doc_len), jnp.float32
    )
    data = topic.dense_token_data(words, mask)
    state = topic.initialize(
        data, k_topics, vocab, jax.random.fold_in(key, 1), n_docs=n_docs
    )

    # arrays ride as ARGUMENTS, never closures: closed-over arrays are
    # baked into the HLO as constants, and the axon remote-compile
    # endpoint rejects the resulting ~600 MB request (HTTP 413)
    def run(state, words, mask, key):
        def body(st, t):
            kt = jax.random.fold_in(key, t)
            st = topic.blocked_sweep_dense(
                st, words, mask, jax.random.fold_in(kt, 0),
                doc_chunk=doc_chunk,
            )
            st = topic.hdp._sample_beta_jit(
                st, jax.random.fold_in(kt, 1), doc_len
            )
            return st, topic.score_joint(st)

        return jax.lax.scan(body, state, jnp.arange(sweeps))

    t0 = time.perf_counter()
    run_c = jax.jit(run).lower(state, words, mask, key).compile()
    compile_s = time.perf_counter() - t0
    out, trace = run_c(state, words, mask, key)
    _fetch(out.topic_total)  # warm-up + fence
    t0 = time.perf_counter()
    out, trace = run_c(state, words, mask, key)
    _fetch(out.topic_total)
    dt = time.perf_counter() - t0

    predictive = None
    if heldout_frac > 0:
        # a 3-sweep state is far from converged — chain a few more calls
        # of the already-compiled program (outside the timed region) so
        # the perplexity reflects a usable posterior, then score the
        # held-out tokens (each call costs `sweeps` extra sweeps, ~2.6 s
        # at config-4 scale)
        for c in range(5):
            out, _ = run_c(out, words, mask, jax.random.fold_in(key, 50 + c))
        _fetch(out.topic_total)
        # host-side subset of the held positions (data-dependent size),
        # then posterior-mean perplexity of JUST those tokens
        held_np = _fetch(held).reshape(-1) > 0
        idx = np.nonzero(held_np)[0]
        held_td = topic.TokenData(
            jnp.asarray(_fetch(words).reshape(-1)[idx]),
            jnp.asarray((idx // doc_len).astype(np.int32)),
            jnp.ones(len(idx), jnp.float32),
        )
        ppl = float(_fetch(jax.jit(topic.perplexity)(out, held_td)))
        predictive = {
            "heldout_tokens": int(len(idx)),
            "perplexity": round(ppl, 2),
            "random_perplexity": vocab,
        }

    return {
        "n_docs": n_docs,
        "tokens": T,
        "k_topics": k_topics,
        "vocab": vocab,
        "sweeps": sweeps,
        "sweeps_per_s": round(sweeps / dt, 3),
        "tokens_per_s": round(T * sweeps / dt, 0),
        "compile_s": round(compile_s, 1),
        "k_active": int(_fetch(out.active_topics())),
        "score_final": float(_fetch(trace)[-1]),
        "predictive": predictive,
    }


def run_smc_tier(n, d, k_max, n_particles, key, block=4096,
                 warm_run=True, warmup=512):
    """Config-5: block-SMC rows/s at scale (O(N/B) device steps).

    Uses kernels/smc.py's blocked variant: a row-sequential warmup then
    rows absorbed in blocks, with θ-Rao-Blackwellized incremental weights
    (round-5 redesign — logz is now validated against the collapsed-Gibbs
    joint-score lower bound at medium scale, tests/test_smc.py) and
    blocked-Gibbs rejuvenation every step.

    warm_run=False compiles ahead of time (compile_s reported) and times
    the FIRST execution — used at the 1M x 256 stated shape where a
    discarded warm-up run would double a ~minutes-long tier; the timed
    number then includes one-time buffer/layout costs (conservative).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from common_tpu import models
    from common_tpu import state as st
    from common_tpu.kernels import smc

    defn = st.model_definition(n, [models.niw(d)], k_max=k_max)
    hyper = {
        "mu0": jnp.zeros(d, jnp.float32),
        "kappa": 1.0,
        "psi": jnp.eye(d, dtype=jnp.float32),
        "nu": float(d + 2),
    }
    h = 2048  # held-out rows from the SAME mixture (one datagen + split)
    x_all = make_data_device(jax.random.fold_in(key, 0), n + h, d)
    x, xh = x_all[:n], x_all[n:]
    data = ((x, jnp.ones(n, jnp.float32)),)
    parts = smc.init_particles(
        defn, data, jax.random.fold_in(key, 1), n_particles,
        cluster_hp={"alpha": 1.0}, feature_hps=[hyper],
    )

    t0 = time.perf_counter()
    compiled = smc.run_blocked.lower(
        parts, data, jax.random.fold_in(key, 2), block=block,
        warmup=warmup,
    ).compile()
    compile_s = time.perf_counter() - t0

    first_s = None
    if warm_run:
        t0 = time.perf_counter()
        res = compiled(parts, data, jax.random.fold_in(key, 2))
        logz = float(_fetch(res.logz))
        first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = compiled(parts, data, jax.random.fold_in(key, 2))
    logz = float(_fetch(res.logz))
    dt = time.perf_counter() - t0

    rows_per_s = n / dt

    # logz health (VERDICT r04 weak #8): an evidence estimate whose
    # per-step ESS collapsed to ~1 at every step is degenerate and should
    # say so in the record.  After the round-5 RB-weight + warmup redesign
    # the trace covers warmup rows then blocks.
    ess_trace = np.asarray(_fetch(res.ess_trace))
    n_collapsed = int((ess_trace < 2.0).sum())
    logz_health = {
        "min_step_ess": round(float(ess_trace.min()), 2) if ess_trace.size
        else None,
        "median_step_ess": round(float(np.median(ess_trace)), 2)
        if ess_trace.size else None,
        "steps_ess_lt2": n_collapsed,
        "steps": int(ess_trace.size),
        # degenerate = weights collapsed at >half the steps — the r04
        # failure signature (resampling fired every block at ESS ~1)
        "logz_degenerate": bool(n_collapsed > 0.5 * max(ess_trace.size, 1)),
    }

    # particle-cloud held-out predictive (BASELINE quality metric):
    # logsumexp over weighted particles of per-row predictive logp on
    # the 2048 same-mixture rows split off above (outside the timed
    # region)
    predictive = None
    try:
        from jax.scipy.special import logsumexp as _lse

        @jax.jit
        def cloud_lp(parts_out, log_w, xh):
            held_ = ((xh, jnp.ones(h, jnp.float32)),)
            lw = jax.nn.log_softmax(log_w)
            n_p2 = log_w.shape[0]
            lp = jax.vmap(
                lambda i: st.heldout_logp(
                    jax.tree_util.tree_map(lambda l: l[i], parts_out),
                    held_,
                )
            )(jnp.arange(n_p2))                     # [P, h]
            return jnp.mean(_lse(lw[:, None] + lp, axis=0))

        mean_lp = float(_fetch(cloud_lp(res.particles, res.log_w, xh)))
        predictive = {
            "heldout_rows": h,
            "mean_logp": round(mean_lp, 4),
            "per_dim": round(mean_lp / d, 5),
        }
    except Exception as e:
        predictive = {"error": repr(e)}
    return {
        "mode": "block-smc",
        "n": n,
        "d": d,
        "k_max": k_max,
        "particles": n_particles,
        "block": block,
        "warmup_rows": warmup,
        "rows_per_s": round(rows_per_s, 1),
        "run_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "first_call_s": None if first_s is None else round(first_s, 1),
        "cold_timed": not warm_run,
        "logz": logz,
        "logz_health": logz_health,
        "n_resamples": int(_fetch(res.n_resamples)),
        "extrapolated_1m_rows_s": round(1e6 / rows_per_s, 1),
        "predictive": predictive,
    }


def numpy_collapsed_rows_per_s(d, k_active, budget_s=2.5, seed=0,
                               replicates=5):
    """Reference-architecture baseline: sequential per-row collapsed Gibbs.

    Mirrors SURVEY.md §3.2's hot loop: remove row → score all active
    clusters + 1 empty (NIW Student-t predictive via numpy Cholesky) →
    categorical draw → add row.  Per-row cost is independent of total N,
    so the caller scales to full-N sweeps/s.  Returns (median, min, max)
    over `replicates` fixed-budget measurements — the spread is published
    as `baseline_range` (round-3 weak item 4: the headline multiplier
    varied ~5x between records with the spread hidden).
    """
    import numpy as np
    from numpy.linalg import cholesky, slogdet
    from scipy.special import gammaln

    def one(seed):
        rng = np.random.default_rng(seed)
        m = 512
        sub = rng.normal(size=(m, d))
        alpha = 1.0
        kappa0, nu0 = 1.0, d + 2.0
        mu0 = np.zeros(d)
        psi0 = np.eye(d)

        z = rng.integers(0, k_active, size=m)
        stats = {}
        for k in range(k_active):
            rows = sub[z == k]
            stats[k] = [len(rows), rows.sum(0), rows.T @ rows]

        def pred_logpdf_all(x, ks):
            out = np.empty(len(ks))
            for i, k in enumerate(ks):
                cnt, sx, sxx = stats.get(
                    k, [0, np.zeros(d), np.zeros((d, d))]
                )
                kn = kappa0 + cnt
                nun = nu0 + cnt
                mun = (kappa0 * mu0 + sx) / kn
                psin = (psi0 + sxx + kappa0 * np.outer(mu0, mu0)
                        - kn * np.outer(mun, mun))
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
            i = rows_done % m
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
        return rows_done / (time.perf_counter() - t0)

    import numpy as np

    vals = [one(seed + r) for r in range(replicates)]
    return float(np.median(vals)), float(np.min(vals)), float(np.max(vals))


# (n, d, k_max, sweeps) — smallest first; last is the BASELINE.md headline.
LADDER = [
    (20_000, 16, 16, 10),
    (100_000, 64, 32, 8),
    (250_000, 128, 64, 6),
    (500_000, 256, 64, 5),
    (1_000_000, 256, 64, 5),
]
ESS_TIER = (100_000, 64, 32, 200)  # dedicated honest-ESS tier (>=200 samples)


# ---------------------------------------------------------------------------
# TPU child: all device work lives here; progress goes to a JSONL file
# ---------------------------------------------------------------------------
def _emit(fp, obj):
    fp.write(json.dumps(obj) + "\n")
    fp.flush()
    os.fsync(fp.fileno())


def child_main(args):
    out_path = args.progress
    fp = open(out_path, "a", buffering=1)
    _emit(fp, {"event": "start", "pid": os.getpid(), "t": time.time()})
    # absolute cutoff for optional work, anchored at child START (warmup
    # included): once the parent's window is spent the child should wind
    # down and free the single-client worker, not keep measuring
    t_end = time.monotonic() + args.total_s - 30.0

    import jax

    # --- persistent compilation cache (round-5, VERDICT r04 next #3):
    # verified to work THROUGH the axon remote-compile path (probe:
    # cross-process compile 2.9 s -> 0.6 s, entry written).  Identical
    # tier programs stop costing ~100-150 s of the extras budget on every
    # official run, which is what starved chains/config2/config3 out of
    # BENCH_r04. ---
    try:
        cache_dir = os.environ.get(
            "BENCH_JAX_CACHE_DIR", "/root/.cache/jax_bench"
        )
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
    except Exception as e:  # never let cache plumbing cost the run
        print(f"# compilation cache unavailable: {e!r}", file=sys.stderr)

    # --- warmup: first axon contact (100-456 s measured) happens HERE,
    # before the measurement budget clock starts ---
    import jax.numpy as jnp

    t0 = time.perf_counter()
    y = jnp.ones((256, 256)) @ jnp.ones((256, 256))
    _fetch(y[:1, :1])
    warm_s = time.perf_counter() - t0
    device = str(jax.devices()[0])
    _emit(fp, {"event": "warmup", "s": round(warm_s, 1), "device": device})

    deadline = time.monotonic() + args.budget_s

    if args.n or args.d or args.k or args.sweeps:
        ladder = [(args.n or 100_000, args.d or 64, args.k or 32,
                   args.sweeps or 8)]
    elif args.smoke:
        ladder = LADDER[:1]
    else:
        ladder = LADDER

    tiers = []
    result = {
        "metric": "blocked Gibbs sweeps/s (no tier completed)",
        "value": None,
        "unit": "sweeps/s",
        "vs_baseline": None,
        "device": device,
        "warmup_s": round(warm_s, 1),
        "tpu_preflight_failed": False,
        "budget_s": args.budget_s,
        "fused_tier": None,
        "ess_tier": None,
        "hdp": None,
        "smc": None,
        "configs": {},
        "chains_on_chip": None,
        "chains_headline": None,
        "tiers": tiers,
    }

    def publish_top(top):
        result.update({
            "metric": (
                f"{top['kernel']} Gibbs sweeps/s, {top['n']}x{top['d']} "
                f"DPMM-NIW K_max={top['k_max']}"
            ),
            "value": round(top["sweeps_per_s"], 4),
            "ess_per_s": top["ess_per_s"],
            "tflops": top["tflops"],
            "mfu_vs_bf16_peak": top["mfu_vs_bf16_peak"],
            "k_active": top["k_active"],
        })
        _emit(fp, {"event": "result", "result": result})

    rate = None
    last_compile = 30.0
    for i, (n, d, k_max, sweeps) in enumerate(ladder):
        work = 4.0 * n * k_max * d * d * sweeps
        remaining = deadline - time.monotonic()
        if rate is not None:
            est = work / rate + 1.6 * last_compile + 0.15 * n * d * 4 / 1e9
            if est > remaining:
                _emit(fp, {"event": "skip", "tier": [n, d, k_max],
                           "est": round(est, 1),
                           "remaining": round(remaining, 1)})
                continue
        elif remaining < 20.0:
            break
        try:
            t = run_tier(n, d, k_max, sweeps, jax.random.key(17 + i))
        except Exception as e:
            _emit(fp, {"event": "error", "stage": f"tier-{n}x{d}",
                       "err": repr(e)})
            continue
        tiers.append(t)
        rate = 4.0 * n * k_max * d * d / (t["run_s"] / sweeps)
        last_compile = t["compile_s"]
        _emit(fp, {"event": "tier", "tier": t})
        publish_top(t)

    if not tiers:
        _emit(fp, {"event": "final", "result": result})
        return

    top = tiers[-1]

    # Extras, in VERDICT-priority order, each gated on the remaining
    # absolute child budget.  A hang inside any of them costs only the
    # remaining extras: the parent already has everything emitted so far.
    def remaining():
        return t_end - time.monotonic()

    # 1. fused Pallas tier at the top completed shape (the flagship)
    fused_ok = False
    if not args.smoke and remaining() > top["run_s"] * 2.5 + 60.0:
        try:
            fused = run_tier(top["n"], top["d"], top["k_max"],
                             top["sweeps"], jax.random.key(99),
                             kernel="fused")
            result["fused_tier"] = fused
            fused_ok = True
            _emit(fp, {"event": "tier", "tier": fused})
            if fused["sweeps_per_s"] > top["sweeps_per_s"]:
                tiers.append(fused)
                top = fused
            publish_top(top)
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "fused", "err": repr(e)})

    if not args.smoke:
        _emit(fp, {"event": "extras", "remaining_s": round(remaining(), 1)})

    # 2. NORTH-STAR ESS tier at the top completed ladder shape (the
    # 1M x 256 K=64 headline when the ladder got there): MULTI-SEED
    # >=300-sweep traces with per-statistic ESS and a published spread
    # (round-4 VERDICT next #2 — the r04 headline rested on one
    # 100-sweep trace with ~4 effective samples).  Protocol adapts to
    # the window; the compilation cache (above) is what makes 2-3
    # seeds x 300 sweeps affordable in an official run.
    if not args.smoke and remaining() > 150.0:
        try:
            rate = max(top["sweeps_per_s"], 0.1)
            budget = 0.6 * remaining()
            # 2 seeds x 300 sweeps is the default protocol (spread is
            # still quantified); the third seed costs ~75 s that a
            # ~670 s warm extras window needs for config3 + SMC (reh-3:
            # 3-seed ESS + fused-bbv left 43 s and shed both) — take it
            # only when the window is genuinely generous
            if 3 * 300 / rate + 420.0 < budget:
                n_seeds, sweeps_e = 3, 300
            elif 2 * 300 / rate + 60.0 < budget:
                n_seeds, sweeps_e = 2, 300
            else:
                n_seeds, sweeps_e = 2, 150
            et = run_ess_tier(
                top["n"], top["d"], top["k_max"], jax.random.key(7),
                sweeps=sweeps_e, n_seeds=n_seeds,
                kernel="fused" if fused_ok else "blocked", heldout=4096,
                deadline=time.monotonic() + budget,
            )
            result["ess_tier"] = et
            result["ess_per_s"] = et["ess_per_s"]
            result["ess_per_s_spread"] = et["ess_per_s_spread"]
            result["ess_est"] = et["ess_est"]
            result["predictive"] = et["predictive"]
            _emit(fp, {"event": "tier", "tier": et})
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "ess", "err": repr(e)})

    # 3. HDP config-4 tier (1M docs / 50M tokens; dense sweep costs
    # ~90 s post-warmup: gen ~20 + compile ~32 + 2x3 sweeps ~8), now with
    # held-out-token perplexity
    if (not args.smoke and os.environ.get("BENCH_SKIP_HDP", "") != "1"
            and remaining() > 150.0):
        try:
            hdp = run_hdp_tier(1_000_000, 50, 32, 10_000, 3,
                               jax.random.key(6))
            result["hdp"] = hdp
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "hdp", "err": repr(e)})

    # 4. on-chip chain scaling — promoted above the config tiers in
    # round 4: it showcases the sweep_chains rebuild (VERDICT r3 item 2)
    # and the round-3 rehearsal starved it (87 s left at child finish)
    if not args.smoke and remaining() > 90.0:
        try:
            result["chains_on_chip"] = run_chain_scaling_tier(
                jax.random.key(11)
            )
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "chains", "err": repr(e)})

    # 4b. multi-chain AT THE HEADLINE SHAPE (VERDICT r04 next #5) —
    # OPT-IN ONLY (BENCH_CHAINS_HEADLINE=1): the C=4 vmapped-sweep
    # program at 1M x 256 is not reliably compilable through the axon
    # remote-compile service (round-5 continuation: the compile burned
    # 40 min of a rehearsal's window and then died with "remote_compile:
    # Broken pipe"; the prior builder session DID get it through and
    # measured 5.97 aggregate chain-sweeps/s — BENCH_NOTES round 5).
    # The measured multi-chain numbers therefore live in BENCH_NOTES as
    # builder evidence rather than risking the official tier matrix.
    if (not args.smoke
            and os.environ.get("BENCH_CHAINS_HEADLINE", "") == "1"
            and remaining() > 190.0):
        try:
            ch = run_chains_headline_tier(
                jax.random.key(13), top["n"], top["d"], top["k_max"]
            )
            best = max(
                v["aggregate_chain_sweeps_per_s"]
                for v in ch["chains"].values()
            )
            ch["vs_single_chain"] = round(best / top["sweeps_per_s"], 3)
            result["chains_headline"] = ch
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "chains-headline",
                       "err": repr(e)})

    # 5./6. configs 2-3 at their stated scale (config 2 now also times
    # the fused bbv kernel and scores held-out rows)
    if not args.smoke and remaining() > 75.0:
        try:
            # fused variant (~110 s warm incl. its tier) only when it
            # cannot squeeze the SMC window out (reh-3: fused at
            # remaining=380 left SMC and config3 without their gates)
            result["configs"]["config2"] = run_config2_tier(
                jax.random.key(21), fused=remaining() > 300.0
            )
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "config2", "err": repr(e)})

    if not args.smoke and remaining() > 150.0:
        try:
            result["configs"]["config3"] = run_config3_tier(
                jax.random.key(22)
            )
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "config3", "err": repr(e)})

    # 7. block-SMC (config 5) AT ITS STATED SHAPE: 1M x 256 (round-3
    # VERDICT item 1b — never fall back to smaller d; smaller P is the
    # sanctioned retreat).  Cold-timed (AOT compile + one timed run)
    # unless the window is generous.
    # DEMOTED BELOW hdp/chains/configs in round 5: a TPU worker crash
    # poisons the child process's backend, and the round-5 rehearsal saw
    # the 1M×256 SMC program kill the worker and take every downstream
    # tier with it (BENCH_NOTES round-5 incidents) — risky programs run
    # after the tiers that have never crashed.
    if (os.environ.get("BENCH_SKIP_SMC", "") != "1" and not args.smoke
            and remaining() > 110.0):
        # warmup=128 bisected on the real chip: 512 warmup rows crash
        # the worker at 1M×256 (scan-length/program-size limit), 0 and
        # 128 run clean, and 128's logz (−3.673e8) clears the Gibbs
        # joint bound (≈ −3.77e8) with margin — BENCH_NOTES round 5
        smc_warmup = int(os.environ.get("BENCH_SMC_WARMUP", "128"))
        for n_p, blk in ((16, 8192), (8, 8192)):
            try:
                result["smc"] = run_smc_tier(
                    1_000_000, 256, 64, n_p, jax.random.key(5), block=blk,
                    warm_run=remaining() > 500.0, warmup=smc_warmup,
                )
                _emit(fp, {"event": "result", "result": result})
                break
            except Exception as e:
                _emit(fp, {"event": "error", "stage": f"smc-p{n_p}",
                           "err": repr(e)})
    # fallback: the round-3 100k x 32 shape so the record never lacks an
    # smc object entirely
    if (os.environ.get("BENCH_SKIP_SMC", "") != "1" and not args.smoke
            and result["smc"] is None and remaining() > 120.0):
        try:
            result["smc"] = run_smc_tier(100_000, 32, 32, 128,
                                         jax.random.key(5))
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "smc", "err": repr(e)})

    # 8. split-merge A/B arm (VERDICT r04 next #6): sweep + Jain-Neal
    # split-merge vs plain sweep on ESS/s.  Deliberately LAST among the
    # big tiers so it can never starve the required matrix (the round-4
    # failure mode).  SAFETY: at the 1M x 256 headline the fused+sm
    # program KILLED the axon worker ("TPU worker process crashed or
    # restarted ... kernel fault", round-5 incident — BENCH_NOTES); the
    # arm therefore runs at the secondary ESS shape by default and the
    # headline shape only with BENCH_SM_AB_HEADLINE=1.
    if (not args.smoke and os.environ.get("BENCH_SM_AB", "1") == "1"
            and result.get("ess_tier") is not None
            and remaining() > 100.0):
        try:
            if os.environ.get("BENCH_SM_AB_HEADLINE", "") == "1":
                ab_shape = (top["n"], top["d"], top["k_max"])
            else:
                ab_shape = (100_000, 64, 32)
            sm = run_ess_tier(
                *ab_shape, jax.random.key(8),
                sweeps=150, n_seeds=2,
                kernel="fused+sm", heldout=0,
                deadline=time.monotonic() + 0.5 * remaining(),
            )
            # the plain arm at the SAME shape for a like-for-like ratio
            pl = run_ess_tier(
                *ab_shape, jax.random.key(8),
                sweeps=150, n_seeds=2,
                kernel="fused", heldout=0,
                deadline=time.monotonic() + 0.8 * remaining(),
            )
            sm["ab_plain_ess_per_s"] = pl["ess_per_s"]
            sm["ab_plain_spread"] = pl["ess_per_s_spread"]
            result["ess_tier_sm"] = sm
            _emit(fp, {"event": "tier", "tier": sm})
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "ess-sm", "err": repr(e)})

    # 9. secondary honest-ESS tier at 100k x 64 (round-3 continuity)
    if (not args.smoke and result.get("ess_tier") is None
            and remaining() > 45.0):
        try:
            et = run_tier(*ESS_TIER, jax.random.key(7))
            result["ess_tier"] = et
            result["ess_per_s"] = et["ess_per_s"]
            result["ess_est"] = et["ess_est"]
            _emit(fp, {"event": "tier", "tier": et})
            _emit(fp, {"event": "result", "result": result})
        except Exception as e:
            _emit(fp, {"event": "error", "stage": "ess", "err": repr(e)})

    _emit(fp, {"event": "final", "result": result,
               "remaining_s": round(remaining(), 1)})


# ---------------------------------------------------------------------------
# parent orchestrator
# ---------------------------------------------------------------------------
def _read_events(path):
    events = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    except OSError:
        pass
    return events


def _cpu_smoke_tier(forced=None):
    """CPU fallback: one small tier pinned to the CPU backend.

    Forced shapes are CLAMPED to smoke scale (round-2 weak item 5: a
    forced 1M x 256 tier on the CPU fallback ran away for minutes)."""
    import jax

    # JAX_PLATFORMS=cpu does NOT suppress the axon plugin on this box —
    # pin via default_device; jax.devices("cpu") initializes only the CPU
    # backend, so a wedged axon worker cannot hang this path.
    jax.default_device(jax.devices("cpu")[0]).__enter__()
    n, d, k, s = LADDER[0]
    if forced:
        n = min(forced[0] or n, 50_000)
        d = min(forced[1] or d, 32)
        k = min(forced[2] or k, 32)
        s = min(forced[3] or s, 10)
    return run_tier(n, d, k, s, jax.random.key(17))


def parent_main(args):
    total_s = float(os.environ.get("BENCH_TOTAL_S", 840.0))
    warmup_s = float(os.environ.get("BENCH_WARMUP_S", 480.0))
    t_start = time.monotonic()
    t_hard = t_start + total_s
    _start_watchdog(t_hard + 30.0)

    force_cpu = os.environ.get("BENCH_FORCE_CPU", "") == "1"
    forced = (args.n, args.d, args.k, args.sweeps)
    any_forced = any(v is not None for v in forced)

    child = None
    progress_path = None
    if not force_cpu:
        progress_path = os.path.join(
            "/tmp", f"bench_progress_{os.getpid()}.jsonl"
        )
        log_path = progress_path.replace("progress", "childlog")
        child_cmd = os.environ.get("BENCH_CHILD_CMD")
        if child_cmd:
            cmd = child_cmd.split() + [progress_path]
        else:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--tpu-child", "--progress", progress_path,
                   "--budget-s", str(args.budget_s),
                   "--total-s", str(total_s - (time.monotonic() - t_start))]
            if args.smoke:
                cmd.append("--smoke")
            if args.smc:
                cmd.append("--smc")
            for flag, v in zip(("--n", "--d", "--k", "--sweeps"), forced):
                if v is not None:
                    cmd += [flag, str(v)]
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        # detached (setsid): we will NEVER send this process a signal — a
        # client killed mid-XLA-execution wedges the single-client axon
        # worker (CLAUDE.md); a stalled child is abandoned alive instead.
        child = subprocess.Popen(
            cmd,
            stdin=subprocess.DEVNULL,
            stdout=open(log_path, "w"),
            stderr=subprocess.STDOUT,
            env=env,
            start_new_session=True,
        )
        print(f"# tpu child pid={child.pid} progress={progress_path}",
              file=sys.stderr)

    # --- parent-side CPU work, overlapped with the child's TPU work ---
    cpu_mesh_box = {"result": None}

    def _cpu_mesh_work():
        try:
            import jax

            from common_tpu.parallel import measure_row_scaling

            cpus = jax.devices("cpu")
            with jax.default_device(cpus[0]):
                eff = measure_row_scaling(
                    n=65536, d=16, k_max=16, sweeps=6,
                    shard_counts=(1, 2, 4, 8), devices=cpus,
                )
            eff["note"] = (
                "virtual CPU mesh: collective/plumbing overhead check, "
                "not a multi-chip hardware claim"
            )
            # Round-5 (VERDICT r04 next #7): virtual shards share
            # physical cores, so an `efficiency` scalar here invites a
            # comparison against the 0.8 multi-chip target it cannot
            # speak to.  Drop the ratio entirely; `collectives_ok` + raw
            # per-rung throughput/spread carry the same information.
            eff.pop("efficiency", None)
            cpu_mesh_box["result"] = eff
        except Exception as e:
            print(f"# cpu mesh scaling failed: {e!r}", file=sys.stderr)

    mesh_thread = None
    if not args.smoke and not any_forced and not force_cpu:
        mesh_thread = threading.Thread(
            target=_cpu_mesh_work, daemon=True, name="cpu-mesh-scaling"
        )
        mesh_thread.start()

    # --- poll the child's progress file ---
    child_result = None
    child_state = "none"
    if child is not None:
        warm_deadline = t_start + warmup_s
        final_seen = False
        while True:
            events = _read_events(progress_path)
            warmed = any(e.get("event") == "warmup" for e in events)
            for e in events:
                if e.get("event") == "result":
                    child_result = e["result"]
                if e.get("event") == "final":
                    child_result = e["result"]
                    final_seen = True
            if final_seen:
                child_state = "final"
                break
            rc = child.poll()
            if rc is not None:
                child_state = f"exited rc={rc}"
                break
            if not warmed and time.monotonic() > warm_deadline:
                child_state = "warmup-timeout (abandoned alive)"
                break
            if time.monotonic() > t_hard - 20.0:
                child_state = "deadline (abandoned alive)"
                break
            time.sleep(2.0)
        if child_state == "final":
            try:
                child.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pass

    # --- assemble the one JSON line ---
    tpu_dead = child_result is None
    if tpu_dead:
        try:
            tier = _cpu_smoke_tier(forced if any_forced else None)
            result = {
                "metric": (
                    f"{tier['kernel']} Gibbs sweeps/s, "
                    f"{tier['n']}x{tier['d']} DPMM-NIW "
                    f"K_max={tier['k_max']} (CPU fallback)"
                ),
                "value": round(tier["sweeps_per_s"], 4),
                "unit": "sweeps/s",
                "vs_baseline": None,
                "ess_per_s": tier["ess_per_s"],
                "device": "cpu-fallback",
                "k_active": tier["k_active"],
                "tiers": [tier],
            }
        except Exception as e:
            print(f"# cpu fallback failed: {e!r}", file=sys.stderr)
            result = {
                "metric": "blocked Gibbs sweeps/s (no tier completed)",
                "value": None, "unit": "sweeps/s", "vs_baseline": None,
            }
    else:
        result = child_result
    result["tpu_preflight_failed"] = tpu_dead
    result["child_state"] = child_state
    result["total_s"] = round(time.monotonic() - t_start, 1)
    result["partial"] = child_state not in ("final", "none") and not tpu_dead
    if mesh_thread is not None:
        mesh_thread.join(timeout=max(0.0, t_hard - time.monotonic() - 15.0))
    cpu_mesh_eff = cpu_mesh_box["result"]
    if cpu_mesh_eff is not None or result.get("chains_on_chip"):
        result["efficiency"] = {
            "cpu_mesh_shards": cpu_mesh_eff,
            "chains_on_chip": result.pop("chains_on_chip", None),
        }
    else:
        result.pop("chains_on_chip", None)
        result["efficiency"] = None
    _publish(result)

    # --- numpy reference-architecture baseline (parent CPU) ---
    if not args.skip_baseline and result.get("value"):
        try:
            tiers = result.get("tiers") or []
            top = tiers[-1] if tiers else {"d": 16, "k_active": 8, "n": 20000}
            med, lo, hi = numpy_collapsed_rows_per_s(
                top["d"], max(top.get("k_active", 8), 2)
            )
            base = med / top["n"]
            result["vs_baseline"] = round(result["value"] / base, 1)
            result["baseline"] = (
                "reference-architecture per-row collapsed Gibbs (numpy), "
                "median of 5 fixed-budget replicates, scaled to full N"
            )
            result["baseline_sweeps_per_s"] = float(f"{base:.3e}")
            result["baseline_range"] = [
                float(f"{lo / top['n']:.3e}"), float(f"{hi / top['n']:.3e}")
            ]
        except Exception as e:
            print(f"# baseline failed: {e!r}", file=sys.stderr)

    _publish(result)
    _DONE.set()
    print(json.dumps(_ordered_for_tail(result)), flush=True)
    sys.stderr.flush()
    # skip interpreter teardown: the CPU-mesh thread may still be inside an
    # XLA call, and tearing down live XLA threads segfaults at exit.  All
    # output is flushed; nothing TPU-side is in flight in THIS process.
    os._exit(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="first tier only")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 330.0)))
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--smc", action="store_true",
                    help="(default-on) block-SMC rows/s tier at the "
                    "config-5 stated shape 1M x 256 (disable with "
                    "BENCH_SKIP_SMC=1)")
    # accepted for CLI compatibility; these tiers are default-on now
    ap.add_argument("--hdp", action="store_true",
                    help="(default-on) HDP config-4 tier")
    ap.add_argument("--efficiency", action="store_true",
                    help="(default-on) scaling-efficiency tiers")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--sweeps", type=int, default=None)
    ap.add_argument("--tpu-child", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--progress", type=str, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--total-s", type=float, default=780.0,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.tpu_child:
        child_main(args)
    else:
        parent_main(args)


if __name__ == "__main__":
    main()
