"""Device-mesh helpers.

The reference's only parallelism is threads + OpenMP inside one host
(SURVEY §2 parallelism items 2-4); there is no distributed backend to
translate.  The TPU-native scaling story instead shards the *data-parallel
surfaces* of the SLAM problem over a jax.sharding.Mesh:

- points of a registration problem (sp) — H/b normal-equation reductions
  ride psum over ICI,
- independent loop-closure candidate pairs (dp) — the batched-registration
  path, embarrassingly parallel,
- pose-graph factors (fp) — matrix-free Hx products psum-reduced.

Single chip remains the default deployment (matching the reference's scope);
every entry point here also runs unchanged on a 1-device mesh.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))
