"""bench.py harness plumbing — the driver-facing contract.

The benchmark MUST land one parseable JSON line even when the axon TPU
worker wedges mid-call (round-1 failure: rc=124, parsed=null).  These
tests exercise the watchdog force-flush and the subprocess preflight
without any TPU: they only touch bench.py's pure-host machinery.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
time.sleep(60)  # simulates a wedged XLA call: never returns
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


def test_preflight_timeout_reports_dead():
    """An unresponsive probe (here: guaranteed by a tiny timeout) must
    classify the TPU as dead, not raise or hang."""
    sys.path.insert(0, REPO)
    import bench

    assert bench.tpu_preflight(timeout_s=0.01) is False
