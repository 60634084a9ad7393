#!/usr/bin/env python
"""North-star benchmark: Gibbs sweeps/s + ESS/s on a large DPMM (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Design (round-2 rework — VERDICT.md "Next round" item 1):

* **Time-budgeted progressive ladder.** Tiers run from small to the 1M-row
  256-dim K=64 headline; before each tier we estimate its cost from the
  previous tier's measured per-FLOP rate and *skip* it if the remaining
  wall-clock budget (``--budget-s`` / env ``BENCH_BUDGET_S``, default 360 s)
  cannot cover it.  The reported number is the largest completed tier, so
  the bench always lands a JSON line instead of timing out (round-1 failure
  mode: BENCH_r01.json rc=124).
* **On-device data generation.**  Round 1 generated 1 GB of rows in numpy
  and pushed them through the axon tunnel; here synthesis is a jitted
  device program, so tiers cost compile + compute only.
* **Single-dispatch timed region.**  Each tier's timed sweeps run as one
  ``lax.scan`` inside one compiled call (compile measured separately), so
  per-sweep host→device dispatch latency over the tunnel never pollutes
  throughput.
* **ESS/s.**  The scan also records the joint log-score trace
  (state.score_joint per sweep); bulk ESS (utils/diagnostics.ess) over that
  trace divided by wall time gives the BASELINE.md effective-samples/s
  metric (crude at few sweeps — reported as an estimate).
* **Roofline context.**  A blocked NIW sweep moves ~4·N·K·D² matmul FLOPs
  (score table + suffstat rebuild); achieved TFLOP/s and MFU against the
  197-TFLOP/s bf16 peak of a v5e chip are reported.

vs_baseline: the reference (datamicroscopes) publishes no numbers
(BASELINE.md), so the baseline is its *architecture* — a per-row collapsed
Gibbs sweep (sequential rows, per-cluster NIW predictive via batched
Cholesky) in vectorized numpy, measured on a row subsample under a small
time budget and scaled to the full N (per-row cost is N-independent).

Usage: python bench.py [--smoke] [--budget-s S] [--skip-baseline]
                       [--n N --d D --k K --sweeps S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

# before any jax import: virtual CPU devices for the --efficiency mode's
# scaling ladder (harmless otherwise — TPU device discovery is unaffected)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()


# Best-result-so-far, shared with the watchdog thread.  A wedged axon TPU
# worker hangs *inside* a single XLA call (no Python-level timeout can fire
# in that thread), so a daemon watchdog prints whatever completed and
# force-exits — the driver then still captures a parseable JSON line
# instead of rc=124/parsed=null (round-1 failure mode).
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
        _RESULT.update(result)


def _merge(**fields):
    with _RESULT_LOCK:
        _RESULT.update(fields)


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
            out = dict(_RESULT)
        out["watchdog_timeout"] = True
        print(json.dumps(out), flush=True)
        os._exit(0)

    t = threading.Thread(target=run, daemon=True, name="bench-watchdog")
    t.start()
    return t


def tpu_preflight(timeout_s=240.0):
    """True iff a TPU backend initializes AND executes in a subprocess.

    The axon worker can wedge such that device *enumeration* works (or
    hangs) while every execution/transfer stalls forever — probing in-process
    would wedge the bench itself.  A tiny matmul + host fetch in a child
    process under a hard timeout is the only safe probe."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "assert any(d.platform == 'tpu' for d in jax.devices())\n"
        "y = jnp.ones((128, 128)) @ jnp.ones((128, 128))\n"
        "print('OK', float(np.asarray(y)[0, 0]))\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True, env=env,
        )
        return r.returncode == 0 and "OK" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def make_data_device(key, n, d, n_true=8):
    """Synthesize a Gaussian-mixture row block on the device (jitted)."""
    import jax
    import jax.numpy as jnp

    kc, kz, kn = jax.random.split(key, 3)
    centers = 4.0 * jax.random.normal(kc, (n_true, d), jnp.float32)
    z = jax.random.randint(kz, (n,), 0, n_true)
    x = centers[z] + jax.random.normal(kn, (n, d), jnp.float32)
    return x


def build_tier_fn(n, d, k_max, sweeps, kernel="blocked"):
    """Compiled (datagen → init → S sweeps + score trace) programs.

    kernel: "blocked" (XLA path) or "fused" (Pallas score+Gumbel+argmax
    kernel — the [N, K] table never touches HBM)."""
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
        x = make_data_device(jax.random.fold_in(key, 0), n, d)
        data = ((x, jnp.ones(n, jnp.float32)),)
        s = st.initialize(
            defn,
            data,
            jax.random.fold_in(key, 1),
            cluster_hp={"alpha": 1.0},
            feature_hps=[hyper],
        )
        return x, s

    def run(x, s, key):
        data = ((x, jnp.ones(n, jnp.float32)),)

        def body(state, t):
            kt = jax.random.fold_in(key, t)
            if kernel == "fused":
                state = blocked.sweep_fused(state, data, kt)
            else:
                state = blocked.sweep(state, data, kt)
            return state, st.score_joint(state)

        s, trace = jax.lax.scan(body, s, jnp.arange(sweeps))
        return s, trace

    return jax.jit(setup), jax.jit(run)


def run_tier(n, d, k_max, sweeps, key, kernel="blocked"):
    """Returns a dict of tier measurements (raises on failure/OOM)."""
    import jax
    import numpy as np

    from common_tpu.utils import diagnostics

    setup, run = build_tier_fn(n, d, k_max, sweeps, kernel)

    t0 = time.perf_counter()
    x, s = setup(key)
    np.asarray(s.counts)
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = run.lower(x, s, key).compile()
    compile_s = time.perf_counter() - t0

    # Warm-up execution: the first run of a compiled program pays one-time
    # buffer/layout costs; and on the axon backend block_until_ready does
    # NOT wait for execution — only a literal host fetch does — so every
    # timed region below ends with np.asarray of a small output.
    s_out, trace = compiled(x, s, key)
    np.asarray(s_out.counts)

    t0 = time.perf_counter()
    s_out, trace = compiled(x, s, key)
    np.asarray(s_out.counts)
    dt = time.perf_counter() - t0

    trace = np.asarray(trace, np.float64)
    ess_est = float(diagnostics.ess(trace - trace.mean())) if sweeps >= 4 else float("nan")
    ess_per_s = ess_est / dt if np.isfinite(ess_est) else None

    flops_per_sweep = 4.0 * n * k_max * d * d  # score [N,K] + suffstat rebuild
    tflops = flops_per_sweep * sweeps / dt / 1e12

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
        "ess_est": None if not np.isfinite(ess_est) else round(ess_est, 2),
        "ess_per_s": None if ess_per_s is None else round(ess_per_s, 4),
        "tflops": round(tflops, 2),
        "mfu_vs_bf16_peak": round(tflops / 197.0, 4),
        "k_active": int(np.sum(np.asarray(s_out.counts) > 0)),
        "score_final": float(trace[-1]),
    }


def numpy_collapsed_rows_per_s(d, k_active, budget_s=4.0, seed=0):
    """Reference-architecture baseline: sequential per-row collapsed Gibbs.

    Mirrors SURVEY.md §3.2's hot loop: remove row → score all active
    clusters + 1 empty (NIW Student-t predictive via numpy Cholesky) →
    categorical draw → add row.  Per-row cost is independent of total N,
    so a few seconds of measurement suffice; the caller scales to full-N
    sweeps/s.
    """
    import numpy as np
    from numpy.linalg import cholesky, slogdet
    from scipy.special import gammaln

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
            cnt, sx, sxx = stats.get(k, [0, np.zeros(d), np.zeros((d, d))])
            kn = kappa0 + cnt
            nun = nu0 + cnt
            mun = (kappa0 * mu0 + sx) / kn
            psin = psi0 + sxx + kappa0 * np.outer(mu0, mu0) - kn * np.outer(mun, mun)
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
        crp = np.array([np.log(stats[k][0]) for k in ks[:-1]] + [np.log(alpha)])
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


def run_smc_tier(n, d, k_max, n_particles, key):
    """Config-5 feasibility: SMC rows/s at scale (one compiled scan).

    Sequential imputation is inherently O(N) device steps; this measures
    the per-row cost with P particles vmapped per step and reports rows/s
    + an extrapolated 1M-row wall time.
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
    x = make_data_device(jax.random.fold_in(key, 0), n, d)
    data = ((x, jnp.ones(n, jnp.float32)),)
    parts = smc.init_particles(
        defn, data, jax.random.fold_in(key, 1), n_particles,
        cluster_hp={"alpha": 1.0}, feature_hps=[hyper],
    )

    t0 = time.perf_counter()
    run_c = (
        smc.run.lower(parts, data, jax.random.fold_in(key, 2))
        .compile()
    )
    compile_s = time.perf_counter() - t0

    res = run_c(parts, data, jax.random.fold_in(key, 2))
    np.asarray(res.logz)  # warm-up + fence
    t0 = time.perf_counter()
    res = run_c(parts, data, jax.random.fold_in(key, 2))
    logz = float(np.asarray(res.logz))
    dt = time.perf_counter() - t0

    rows_per_s = n / dt
    return {
        "n": n,
        "d": d,
        "k_max": k_max,
        "particles": n_particles,
        "rows_per_s": round(rows_per_s, 1),
        "run_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "logz": logz,
        "n_resamples": int(np.asarray(res.n_resamples)),
        "extrapolated_1m_rows_s": round(1e6 / rows_per_s, 1),
    }


def run_hdp_tier(n_docs, doc_len, k_topics, vocab, sweeps, key,
                 chunk=1 << 20):
    """Config-4 scale: HDP-LDA blocked sweeps/s on an n_docs-doc corpus.

    Synthetic corpus generated on-device (equal-length docs, topic-block
    vocab); one compiled scan of `sweeps` (chunked blocked sweep + beta
    resample) is timed; reports sweeps/s and tokens/s.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from common_tpu import topic

    T = n_docs * doc_len
    kb = 4  # true topic blocks

    @jax.jit
    def gen(key):
        doc_ids = (jnp.arange(T, dtype=jnp.int32) // doc_len)
        topic_of_doc = doc_ids % kb
        block = vocab // kb
        w = topic_of_doc * block + jax.random.randint(
            key, (T,), 0, block, jnp.int32
        )
        return topic.TokenData(w, doc_ids, jnp.ones(T, jnp.float32))

    data = gen(jax.random.fold_in(key, 0))
    state = topic.initialize(
        data, k_topics, vocab, jax.random.fold_in(key, 1), n_docs=n_docs
    )

    def run(state, key):
        def body(st, t):
            kt = jax.random.fold_in(key, t)
            st = topic.blocked_sweep(
                st, data, jax.random.fold_in(kt, 0), chunk=chunk
            )
            st = topic.hdp._sample_beta_jit(
                st, jax.random.fold_in(kt, 1), doc_len
            )
            return st, topic.score_joint(st)

        return jax.lax.scan(body, state, jnp.arange(sweeps))

    t0 = time.perf_counter()
    run_c = jax.jit(run).lower(state, key).compile()
    compile_s = time.perf_counter() - t0
    out, trace = run_c(state, key)
    np.asarray(out.topic_total)  # warm-up + fence
    t0 = time.perf_counter()
    out, trace = run_c(state, key)
    np.asarray(out.topic_total)
    dt = time.perf_counter() - t0

    return {
        "n_docs": n_docs,
        "tokens": T,
        "k_topics": k_topics,
        "vocab": vocab,
        "sweeps": sweeps,
        "sweeps_per_s": round(sweeps / dt, 3),
        "tokens_per_s": round(T * sweeps / dt, 0),
        "compile_s": round(compile_s, 1),
        "k_active": int(np.asarray(out.active_topics())),
        "score_final": float(np.asarray(trace)[-1]),
    }


# (n, d, k_max, sweeps) — smallest first; last is the BASELINE.md headline.
LADDER = [
    (20_000, 16, 16, 10),
    (100_000, 64, 32, 8),
    (250_000, 128, 64, 6),
    (500_000, 256, 64, 5),
    (1_000_000, 256, 64, 5),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="first tier only")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 360.0)))
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument(
        "--hdp", action="store_true",
        help="also measure HDP-LDA blocked sweeps/s on a 1M-doc corpus "
        "(config-4 scale; adds ~2 min)",
    )
    ap.add_argument(
        "--smc", action="store_true",
        help="also measure SMC sequential-imputation rows/s at 50k rows "
        "(config-5 feasibility; adds ~2 min)",
    )
    ap.add_argument(
        "--efficiency", action="store_true",
        help="also measure data-shard scaling efficiency at 1/2/4/8 shards "
        "on the virtual CPU mesh (plumbing/overhead check on 1-chip boxes; "
        "the real north-star number needs a pod)",
    )
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--d", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--sweeps", type=int, default=None)
    args = ap.parse_args()

    # A tier admitted before the deadline may legitimately finish after it
    # (axon compiles are slow); the watchdog only fires once the run is
    # clearly wedged, and prints whatever completed before force-exiting.
    # Opt-in tiers run after the ladder deadline — give each its allowance;
    # the preflight gets its own 300 s on top so it never eats the
    # measurement budget.
    grace = 180.0
    grace += 300.0 if args.hdp else 0.0
    grace += 300.0 if args.smc else 0.0
    grace += 180.0 if args.efficiency else 0.0
    _start_watchdog(time.monotonic() + 300.0 + args.budget_s + grace)

    tpu_dead = False
    if os.environ.get("BENCH_FORCE_CPU", "") != "1":
        # Axon first contact alone can take >100 s; do not scale this down
        # with small budgets or a healthy TPU gets misclassified as dead.
        # The axon worker also serves ONE client at a time — a concurrent
        # TPU process blocks this probe until it exits.
        if not tpu_preflight(timeout_s=240.0):
            tpu_dead = True
            print(
                "# TPU preflight failed (worker wedged or absent): "
                "falling back to CPU at smoke scale",
                file=sys.stderr,
            )
    else:
        tpu_dead = True

    import jax

    # measurement budget starts now: preflight time is infrastructure
    deadline = time.monotonic() + args.budget_s

    if tpu_dead:
        # JAX_PLATFORMS=cpu does NOT suppress the axon PJRT plugin on this
        # box (verified) — pin via default_device like tests/conftest.py.
        # jax.devices("cpu") initializes only the CPU backend, so a wedged
        # axon worker cannot hang this path.
        jax.default_device(jax.devices("cpu")[0]).__enter__()

    baseline_reserve_s = 0.0 if args.skip_baseline else 8.0

    if args.n or args.d or args.k or args.sweeps:
        ladder = [(args.n or 100_000, args.d or 64, args.k or 32,
                   args.sweeps or 8)]
    elif args.smoke or tpu_dead:
        ladder = LADDER[:1]
    else:
        ladder = LADDER

    tiers = []
    rate = None  # measured FLOP/s incl. everything, from the last tier
    last_compile = 30.0  # first-compile allowance (axon remote compile)
    for i, (n, d, k_max, sweeps) in enumerate(ladder):
        work = 4.0 * n * k_max * d * d * sweeps
        remaining = deadline - time.monotonic() - baseline_reserve_s
        if rate is not None:
            est = work / rate + 1.6 * last_compile + 0.15 * n * d * 4 / 1e9
            if est > remaining:
                print(
                    f"# skip tier n={n} d={d} k={k_max}: est {est:.0f}s > "
                    f"remaining {remaining:.0f}s",
                    file=sys.stderr,
                )
                continue
        elif remaining < 20.0:
            break
        try:
            t = run_tier(n, d, k_max, sweeps, jax.random.key(17 + i))
        except Exception as e:  # OOM / lowering failure: keep what we have
            print(f"# tier n={n} d={d} k={k_max} failed: {e!r}", file=sys.stderr)
            continue
        tiers.append(t)
        rate = 4.0 * n * k_max * d * d / (t["run_s"] / sweeps)
        last_compile = t["compile_s"]
        _publish({
            "metric": (
                f"{t['kernel']} Gibbs sweeps/s, {t['n']}x{t['d']} "
                f"DPMM-NIW K_max={t['k_max']}"
            ),
            "value": round(t["sweeps_per_s"], 4),
            "unit": "sweeps/s",
            "vs_baseline": None,
            "ess_per_s": t["ess_per_s"],
            "tflops": t["tflops"],
            "mfu_vs_bf16_peak": t["mfu_vs_bf16_peak"],
            "tpu_preflight_failed": tpu_dead,
            "tiers": tiers,
        })

    if not tiers:
        _DONE.set()
        print(json.dumps({
            "metric": "blocked Gibbs sweeps/s (no tier completed)",
            "value": None, "unit": "sweeps/s", "vs_baseline": None,
            "tpu_preflight_failed": tpu_dead,
        }))
        return

    top = tiers[-1]

    # fused-kernel comparison at the top completed tier (Pallas score+
    # Gumbel+argmax vs the XLA blocked path) if the budget still allows
    fused = None
    remaining = deadline - time.monotonic() - baseline_reserve_s
    est_fused = top["run_s"] * 1.5 + 1.6 * last_compile
    if not args.smoke and not tpu_dead and remaining > est_fused:
        try:
            fused = run_tier(
                top["n"], top["d"], top["k_max"], top["sweeps"],
                jax.random.key(99), kernel="fused",
            )
        except Exception as e:
            print(f"# fused tier failed: {e!r}", file=sys.stderr)
    if fused is not None and fused["sweeps_per_s"] > top["sweeps_per_s"]:
        tiers.append(fused)
        top = fused
        _publish({
            "metric": (
                f"{top['kernel']} Gibbs sweeps/s, {top['n']}x{top['d']} "
                f"DPMM-NIW K_max={top['k_max']}"
            ),
            "value": round(top["sweeps_per_s"], 4),
            "unit": "sweeps/s",
            "vs_baseline": None,
            "ess_per_s": top["ess_per_s"],
            "tflops": top["tflops"],
            "mfu_vs_bf16_peak": top["mfu_vs_bf16_peak"],
            "tpu_preflight_failed": tpu_dead,
            "fused_tier": fused,
            "tiers": tiers,
        })

    hdp_tier = None
    if args.hdp:
        try:
            hdp_tier = run_hdp_tier(
                1_000_000, 50, 32, 10_000, 3, jax.random.key(6)
            )
            _merge(hdp=hdp_tier)
        except Exception as e:
            print(f"# hdp tier failed: {e!r}", file=sys.stderr)

    efficiency = None
    if args.efficiency:
        try:
            from common_tpu.parallel import measure_row_scaling

            cpus = jax.devices("cpu")
            with jax.default_device(cpus[0]):
                efficiency = measure_row_scaling(
                    n=65536, d=16, k_max=16, sweeps=6,
                    shard_counts=(1, 2, 4, 8), devices=cpus,
                )
            efficiency["note"] = (
                "virtual CPU mesh: collective/plumbing overhead check, "
                "not a multi-chip hardware claim"
            )
            _merge(efficiency=efficiency)
        except Exception as e:
            print(f"# efficiency measurement failed: {e!r}", file=sys.stderr)

    # SMC runs LAST: a 50k-row scan once crashed the axon TPU worker
    # ("kernel fault"), wedging the device for every later executable —
    # nothing TPU-bound may run after this tier.
    smc_tier = None
    if args.smc:
        try:
            smc_tier = run_smc_tier(20_000, 8, 32, 128, jax.random.key(5))
            _merge(smc=smc_tier)
        except Exception as e:
            print(f"# smc tier failed: {e!r}", file=sys.stderr)

    vs = None
    base_sweeps_per_s = None
    if not args.skip_baseline:
        budget = max(min(deadline - time.monotonic() - 1.0, 6.0), 1.0)
        try:
            rows_per_s = numpy_collapsed_rows_per_s(
                top["d"], max(top["k_active"], 2), budget_s=budget
            )
            base_sweeps_per_s = rows_per_s / top["n"]
            vs = top["sweeps_per_s"] / base_sweeps_per_s
        except Exception as e:
            print(f"# baseline failed: {e!r}", file=sys.stderr)

    try:
        device = str(
            jax.devices("cpu")[0] if tpu_dead else jax.devices()[0]
        )
    except Exception:
        device = "unknown"
    result = {
        "metric": (
            f"{top['kernel']} Gibbs sweeps/s, {top['n']}x{top['d']} "
            f"DPMM-NIW K_max={top['k_max']}"
        ),
        "value": round(top["sweeps_per_s"], 4),
        "unit": "sweeps/s",
        "vs_baseline": None if vs is None else round(vs, 1),
        "baseline": (
            "reference-architecture per-row collapsed Gibbs "
            "(numpy), scaled to full N"
        ),
        "baseline_sweeps_per_s": None
        if base_sweeps_per_s is None
        else float(f"{base_sweeps_per_s:.3e}"),
        "ess_per_s": top["ess_per_s"],
        "tflops": top["tflops"],
        "mfu_vs_bf16_peak": top["mfu_vs_bf16_peak"],
        "device": device,
        "k_active": top["k_active"],
        "budget_s": args.budget_s,
        "tpu_preflight_failed": tpu_dead,
        "fused_tier": fused,
        "hdp": hdp_tier,
        "smc": smc_tier,
        "efficiency": efficiency,
        "tiers": tiers,
    }
    _publish(result)
    _DONE.set()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
