"""Test harness config.

- Forces an 8-device virtual CPU platform (the SURVEY.md §7 recipe) so
  sharding/collective tests run without a TPU pod:
  XLA_FLAGS=--xla_force_host_platform_device_count=8, then grab
  jax.devices("cpu") and pin computations there via jax.default_device.
- Unit tests run on CPU: the axon TPU tunnel has high dispatch latency and
  single-chip capacity; numerics tests don't need it.  TPU-targeted smoke
  tests opt in via the `tpu` marker (skipped when no TPU present).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, f"expected >= 8 virtual CPU devices, got {len(cpus)}"
    return cpus


@pytest.fixture(autouse=True)
def _on_cpu():
    """Pin every test to CPU unless it explicitly asks for the TPU."""
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running statistical test")


def pytest_collection_modifyitems(config, items):
    try:
        has_tpu = any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        has_tpu = False
    skip_tpu = pytest.mark.skip(reason="no TPU device available")
    for item in items:
        if "tpu" in item.keywords:
            if not has_tpu:
                item.add_marker(skip_tpu)
            # Every real-TPU test is implicitly `slow`: the default gate
            # (`-m "not slow"`) must stay TPU-free — the axon worker is
            # single-client, so a pytest run touching the TPU would block
            # (or be blocked by) any concurrent bench/driver process.
            item.add_marker(pytest.mark.slow)
