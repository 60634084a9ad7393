"""bench.py harness plumbing — the driver-facing contract.

The benchmark MUST land one parseable JSON line even when the axon TPU
worker wedges mid-call (round-1 failure: rc=124, parsed=null; round-2
failure: the preflight's subprocess-kill wedged the worker it probed).
Round-3 architecture: the parent NEVER touches the TPU and NEVER signals
the detached TPU child; these tests exercise the parent's poll/abandon/
fallback logic with fake children, entirely without a TPU.
"""

import json
import os

import pytest
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_parent(env_extra, args=(), timeout=240):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--skip-baseline", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line), r


def _fake_child(body):
    """Write a fake-child script; parent invokes it as `script <progress>`."""
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False, dir="/tmp"
    )
    f.write(textwrap.dedent(body))
    f.close()
    return f"{sys.executable} {f.name}"


def test_watchdog_flushes_best_result_and_exits():
    """A hung main thread must not prevent the JSON line: the watchdog
    prints the last published result and force-exits 0."""
    code = """
import sys, time
sys.path.insert(0, %r)
import bench
bench._publish({"metric": "m", "value": 1.25, "unit": "sweeps/s",
                "vs_baseline": None})
bench._start_watchdog(time.monotonic() + 0.2)
time.sleep(60)  # simulates a wedged call: never returns
""" % (REPO,)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=30,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 1.25
    assert out["watchdog_timeout"] is True


def test_watchdog_stands_down_when_done():
    code = """
import sys, time
sys.path.insert(0, %r)
import bench
bench._start_watchdog(time.monotonic() + 0.2)
bench._DONE.set()
time.sleep(0.6)
print("CLEAN")
""" % (REPO,)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=30,
    )
    assert r.returncode == 0
    assert "CLEAN" in r.stdout
    assert "watchdog_timeout" not in r.stdout


def test_force_cpu_smoke_lands_json():
    """BENCH_FORCE_CPU=1: no child is spawned; the CPU smoke tier runs
    in-process and one JSON line lands."""
    out, _ = _run_parent({"BENCH_FORCE_CPU": "1", "BENCH_TOTAL_S": "200"},
                         args=("--smoke",))
    assert out["tpu_preflight_failed"] is True
    assert out["value"] is not None and out["value"] > 0
    assert out["device"] == "cpu-fallback"


def test_cpu_fallback_clamps_forced_shapes():
    """--n 1000000 with a dead TPU must clamp to smoke scale, not run a
    1M-row tier on the CPU (round-2 weak item 5)."""
    out, _ = _run_parent(
        {"BENCH_FORCE_CPU": "1", "BENCH_TOTAL_S": "200"},
        args=("--n", "1000000", "--d", "256", "--k", "64"),
    )
    tier = out["tiers"][0]
    assert tier["n"] <= 50_000
    assert tier["d"] <= 32


@pytest.mark.slow  # heavy subprocess spawn; the force-cpu +
# partial-progress tests keep the one-JSON-line contract in the fast gate
def test_stalled_child_is_abandoned_not_killed():
    """A child that never warms up: the parent falls back to CPU, prints
    JSON, exits 0, and the fake child is left alive (no signal sent)."""
    marker = tempfile.NamedTemporaryFile(delete=False, dir="/tmp").name
    cmd = _fake_child(f"""
    import sys, time, os, signal
    # record if anyone signals us (they must not)
    def note(sig, frame):
        open({marker!r} + ".sig", "w").write(str(sig))
    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, note)
    prog = sys.argv[1]
    open(prog, "a").write('{{"event": "start", "pid": %d}}\\n' % os.getpid())
    time.sleep(20)  # never emits warmup
    open({marker!r}, "w").write("survived")
    """)
    out, r = _run_parent({
        "BENCH_CHILD_CMD": cmd,
        "BENCH_WARMUP_S": "3",
        "BENCH_TOTAL_S": "60",
    }, args=("--smoke",))
    assert out["tpu_preflight_failed"] is True
    assert "abandoned alive" in out["child_state"]
    assert out["value"] is not None  # CPU fallback tier
    # give the fake child time to finish its sleep and write the marker
    import time as _t

    for _ in range(120):
        if os.path.exists(marker) and open(marker).read() == "survived":
            break
        _t.sleep(0.25)
    assert os.path.exists(marker), "fake child was killed by the parent"
    assert not os.path.exists(marker + ".sig"), "parent signalled the child"


def test_partial_child_progress_is_reported():
    """A child that emits a result then stalls: the parent publishes that
    best-so-far result with partial=true."""
    cmd = _fake_child("""
    import sys, json, time
    prog = sys.argv[1]
    def emit(o):
        open(prog, "a").write(json.dumps(o) + "\\n")
    emit({"event": "start"})
    emit({"event": "warmup", "s": 1.0, "device": "FakeTPU"})
    emit({"event": "result", "result": {
        "metric": "blocked Gibbs sweeps/s, 20000x16 DPMM-NIW K_max=16",
        "value": 123.4, "unit": "sweeps/s", "vs_baseline": None,
        "device": "FakeTPU", "tiers": [
            {"n": 20000, "d": 16, "k_max": 16, "kernel": "blocked",
             "sweeps": 10, "sweeps_per_s": 123.4, "run_s": 0.1,
             "k_active": 8}]}})
    time.sleep(30)  # stalls before final
    """)
    out, _ = _run_parent({
        "BENCH_CHILD_CMD": cmd,
        "BENCH_WARMUP_S": "30",
        "BENCH_TOTAL_S": "32",
    })
    assert out["value"] == 123.4
    assert out["partial"] is True
    assert out["tpu_preflight_failed"] is False
    assert out["device"] == "FakeTPU"


@pytest.mark.slow  # heavy subprocess spawn; the force-cpu +
# partial-progress tests keep the one-JSON-line contract in the fast gate
def test_final_child_result_passes_through():
    cmd = _fake_child("""
    import sys, json
    prog = sys.argv[1]
    def emit(o):
        open(prog, "a").write(json.dumps(o) + "\\n")
    emit({"event": "start"})
    emit({"event": "warmup", "s": 1.0, "device": "FakeTPU"})
    emit({"event": "final", "result": {
        "metric": "blocked Gibbs sweeps/s, 1000000x256 DPMM-NIW K_max=64",
        "value": 4.5, "unit": "sweeps/s", "vs_baseline": None,
        "device": "FakeTPU", "tiers": [
            {"n": 1000000, "d": 256, "k_max": 64, "kernel": "fused",
             "sweeps": 5, "sweeps_per_s": 4.5, "run_s": 1.1,
             "k_active": 14}]}})
    """)
    out, _ = _run_parent({
        "BENCH_CHILD_CMD": cmd,
        "BENCH_TOTAL_S": "120",
    })
    assert out["value"] == 4.5
    assert out["partial"] is False
    assert out["child_state"] == "final"
    assert out["tpu_preflight_failed"] is False


@pytest.mark.slow  # heavy subprocess spawn; the force-cpu +
# partial-progress tests keep the one-JSON-line contract in the fast gate
def test_headline_survives_tail_truncation():
    """The driver's official record keeps only the LAST 4 KB of output
    (round-3 VERDICT item 3): a result with bulky tiers must still carry
    metric/value/summary inside that tail window."""
    filler = [{"n": 1000 * i, "d": 64, "k_max": 32, "kernel": "blocked",
               "sweeps": 8, "sweeps_per_s": 1.0 + i, "run_s": 8.0,
               "compile_s": 30.0, "setup_s": 2.0, "ess_est": None,
               "ess_per_s": None, "tflops": 3.21, "k_active": 8,
               "mfu_vs_bf16_peak": 0.01, "score_final": -1234567.8,
               "predictive": None}
              for i in range(40)]  # ~8 KB of tier entries
    cmd = _fake_child("""
    import sys, json
    prog = sys.argv[1]
    def emit(o):
        open(prog, "a").write(json.dumps(o) + "\\n")
    emit({"event": "start"})
    emit({"event": "warmup", "s": 1.0, "device": "FakeTPU"})
    emit({"event": "final", "result": {
        "metric": "fused Gibbs sweeps/s, 1000000x256 DPMM-NIW K_max=64",
        "value": 5.28, "unit": "sweeps/s", "vs_baseline": None,
        "device": "FakeTPU",
        "ess_tier": {"n": 1000000, "d": 256, "k_max": 64, "sweeps": 100,
                     "kernel": "fused", "ess_per_s": 1.9},
        "hdp": {"tokens_per_s": 4.0e7,
                "predictive": {"perplexity": 2600.0}},
        "smc": {"n": 1000000, "d": 256, "particles": 16,
                "rows_per_s": 20000.0, "logz": -3.1e8},
        "tiers": %s}})
    """ % (filler,))
    out, r = _run_parent({
        "BENCH_CHILD_CMD": cmd,
        "BENCH_TOTAL_S": "120",
    })
    line = r.stdout.strip().splitlines()[-1]
    assert len(line) > 4096, "test premise: line longer than the window"
    tail = line[-4096:]
    assert '"metric"' in tail and '"value": 5.28' in tail
    assert '"summary"' in tail and '"rows_per_s"' in tail
    # the parsed dict's final keys are the headline, in order
    assert list(out.keys())[-2:] == ["value", "metric"]


def test_chains_headline_tier_structure_cpu():
    """run_chains_headline_tier at a toy shape on CPU.

    d=72 > d_max_xx forces the same vmapped per-chain dispatch inside
    `sweep_chains` that the 1M x 256 headline shape takes (the measured
    winner there - BENCH_NOTES round 5), so the production code path of
    the official tier is what runs here.
    """
    sys.path.insert(0, REPO)
    import bench
    import jax

    out = bench.run_chains_headline_tier(
        jax.random.key(0), 256, 72, 4, chain_counts=(2,), sweeps=2,
        repeats=1,
    )
    info = out["chains"]["2"]
    assert info["aggregate_chain_sweeps_per_s"] > 0
    assert len(info["k_active_per_chain"]) == 2
    assert all(1 <= k <= 4 for k in info["k_active_per_chain"])
    # both fields are independently rounded to 3 decimals
    assert info["per_chain_sweeps_per_s"] == pytest.approx(
        info["aggregate_chain_sweeps_per_s"] / 2, abs=2e-3
    )


def test_stalled_seed_exclusion():
    """A tunnel-stalled seed (558 s vs ~54 s, round-5 incident) must be
    excluded from the kept set; ordinary ~30% jitter must not be."""
    sys.path.insert(0, REPO)
    import bench

    seeds = [{"run_s": 54.5}, {"run_s": 52.7}, {"run_s": 558.0}]
    kept = bench._mark_stalled_seeds(seeds)
    assert [s["stalled"] for s in seeds] == [False, False, True]
    assert len(kept) == 2

    # 30% jitter: all kept
    seeds = [{"run_s": 50.0}, {"run_s": 65.0}]
    assert len(bench._mark_stalled_seeds(seeds)) == 2

    # small shapes: 3x but tiny absolute delta -> kept
    seeds = [{"run_s": 0.5}, {"run_s": 2.0}]
    assert len(bench._mark_stalled_seeds(seeds)) == 2

    assert bench._mark_stalled_seeds([]) == []
