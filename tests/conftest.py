"""Test configuration: two lanes.

Default lane (CPU goldens): JAX on a virtual 8-device CPU mesh with
float64 — multi-chip sharding tests use the virtual devices; numerics
tests use float64 for tight golden comparisons. This must run before jax
is imported anywhere in the test session.

TPU lane: ``DETPROC_TPU_TESTS=1 pytest tests -m tpu`` runs the
device-marked tests (tests/test_tpu_device.py) on the real chip with
float32 tolerances — the on-device regression net for the four-step FFT
precision workarounds and the hot kernels. Without the env var, tpu
tests are skipped and everything else runs on the CPU lane as before.
"""

import os

import pytest

TPU_LANE = os.environ.get("DETPROC_TPU_TESTS", "") == "1"

if not TPU_LANE:
    # force CPU for tests (the session env may point JAX at the TPU)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    # the preinstalled TPU plugin ("axon") can override JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs on the real TPU chip (DETPROC_TPU_TESTS=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU lane disabled (set DETPROC_TPU_TESTS=1 and -m tpu)")
    skip_cpu = pytest.mark.skip(
        reason="CPU-lane test (float64 goldens); not run in the TPU lane")
    for item in items:
        has_tpu = "tpu" in item.keywords
        if not TPU_LANE and has_tpu:
            item.add_marker(skip_tpu)
        elif TPU_LANE and not has_tpu:
            item.add_marker(skip_cpu)
