"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/SPMD paths are exercised
without TPU hardware (the driver separately compile-checks the TPU path).

Note: the environment's sitecustomize forces JAX_PLATFORMS=axon (the TPU
tunnel) and jax snapshots env vars at import time, so we must override via
jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
