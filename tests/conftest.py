"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Multi-chip sharding tests use the virtual devices; numerics tests use
float64 for tight golden comparisons. This must run before jax is imported
anywhere in the test session.
"""

import os

# force CPU for tests (the session env may point JAX at the TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the preinstalled TPU plugin ("axon") can override JAX_PLATFORMS; force cpu
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
