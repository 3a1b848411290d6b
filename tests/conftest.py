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

# ---------------------------------------------------------------------------
# Deterministic-artifact cache.
#
# The expensive fixtures (the golden tests' 240-scan sim+LIO feed, the
# deskew-mode ATE comparison) are bit-deterministic functions of the package
# source: fixed seeds, fixed shapes, single-host XLA:CPU. Caching their
# results keyed on a hash of EVERY .py file in the package (plus the jax
# version, plus the calling test module, plus the call parameters) is
# therefore equivalent to recomputing — any code change misses cleanly and
# the artifact is rebuilt, so regressions can never hide behind a stale hit.
# Same idea (and same /tmp lifetime) as the persistent XLA compile cache.
# ---------------------------------------------------------------------------
_SRC_HASH = None


def _source_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        import glob
        import hashlib

        h = hashlib.sha256()
        root = os.path.join(os.path.dirname(__file__), "..",
                            "fast_lio_sam_qn_tpu")
        for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                  recursive=True)):
            h.update(p.encode())
            with open(p, "rb") as f:
                h.update(f.read())
        h.update(jax.__version__.encode())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def deterministic_cache(name: str, params, builder, extra_files=()):
    """Load-or-build a deterministic artifact (see block comment above).

    `params` must capture every input of `builder` not already covered by
    the package source; `extra_files` should include the calling test
    module's ``__file__`` when the builder's code lives there."""
    import hashlib
    import pickle

    h = hashlib.sha256(repr(params).encode())
    for p in extra_files:
        with open(p, "rb") as f:
            h.update(f.read())
    # pickle.load() of a world-shared path is an arbitrary-code-execution
    # hazard on a multi-user box: only trust a directory we own, locked to
    # 0o700 (and fall back to a uid-suffixed path when someone else
    # pre-created the shared name)
    cache_dir = "/tmp/flsq_test_cache"
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    if os.stat(cache_dir).st_uid != os.getuid():
        cache_dir = f"/tmp/flsq_test_cache_{os.getuid()}"
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        if os.stat(cache_dir).st_uid != os.getuid():
            # both the shared name AND the uid-suffixed fallback are
            # foreign-owned: never pickle.load from (or chmod) a foreign
            # dir — build fresh without caching instead
            return builder()
    os.chmod(cache_dir, 0o700)
    path = os.path.join(
        cache_dir, f"{name}-{_source_hash()}-{h.hexdigest()[:12]}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    out = builder()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return out
