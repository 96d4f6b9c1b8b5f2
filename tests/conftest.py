"""Test configuration: run on CPU in float64 with 8 virtual devices.

Parity/golden tests need f64 (TPU would emulate it slowly); multi-chip
sharding tests use the 8 virtual CPU devices as the fake cluster.  A
sitecustomize in this environment preloads JAX pinned to the TPU platform,
so we steer via jax.config rather than JAX_PLATFORMS.
"""
import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])
