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
# Persistent XLA:CPU compile cache: on this 1-vCPU box the suite is
# compile-bound — and almost entirely by sub-second compiles (a single
# vmap-parity test spends 21 s across dozens of 0.1-0.7 s XLA:CPU
# compiles), so the default-ish 1.0 s min_compile_time cached NOTHING.
# Threshold 0 makes warm `pytest tests/ -q` runs hit the cache for the
# whole compile mass — 24.9 s -> 9.6 s on that test alone (cache keys
# cover HLO + options, so code changes miss cleanly). Same dir
# run.py/bench.py use.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/flsq_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
