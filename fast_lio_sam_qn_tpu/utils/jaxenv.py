"""JAX process-environment setup shared by every CLI entry point
(run.py, bench.py, the tools/ profilers).

Two concerns, both of which must run BEFORE the first jax backend touch:

* ``apply_platform_override`` — honor FLSQ_PLATFORM (e.g. "cpu").  The
  JAX_PLATFORMS env var is NOT reliable here: site customizations that
  register accelerator plugins can rewrite it before jax snapshots the
  environment, silently sending "cpu" subprocesses to the device
  (observed: e2e CI subprocesses riding the tunneled TPU at ~100+ s per
  tiny run).  jax.config.update wins over the env var as long as no
  backend has been initialized yet.

* ``enable_compile_cache`` — persistent XLA compile cache; first TPU
  compiles are 20-40 s on this host, cached reloads are ~instant.
"""
from __future__ import annotations

import os
import sys

CACHE_DIR = "/tmp/flsq_jax_cache"


def apply_platform_override() -> None:
    plat = os.environ.get("FLSQ_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:
            # The backend initialized before us (some import touched it).
            # This MUST be loud: CI subprocesses that set FLSQ_PLATFORM=cpu
            # would otherwise silently ride the TPU tunnel at ~100 s/run.
            print(f"WARNING: FLSQ_PLATFORM={plat} could not be applied "
                  f"(jax backend already initialized): {e}",
                  file=sys.stderr, flush=True)
            return
        if jax.devices()[0].platform != plat:
            print(f"WARNING: FLSQ_PLATFORM={plat} requested but jax "
                  f"initialized platform {jax.devices()[0].platform}",
                  file=sys.stderr, flush=True)


def enable_compile_cache(cache_dir: str = CACHE_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob, or already configured


def setup() -> None:
    """Both of the above, in the required order."""
    apply_platform_override()
    enable_compile_cache()
