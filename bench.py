"""Headline benchmark: per-loop Quatro + Nano-GICP match latency.

Reference baseline (BASELINE.md, /root/reference/README.md:22): 128.6 ms
average per match for FAST-LIO-SAM-QN with optimized matching (200-corr
cap) on an i9-10900K, KITTI seq 05. This benchmark reproduces that
workload shape — two ~0.3 m-voxelized keyframe scans, FPFH + Quatro coarse
alignment (static 200-correspondence cap) followed by covariance-weighted
GICP fine alignment — on the TPU and reports the steady-state median
latency of the full match.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 128.6


def build_pair():
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import se3, voxel
    from fast_lio_sam_qn_tpu.utils import sim

    world = sim.World.room(size=24.0, height=5.0, n_boxes=10, seed=5)
    T1 = np.eye(4)
    T1[:3, 3] = [2.0, -1.5, 1.5]
    R2 = np.asarray(se3.so3_exp(jnp.array([0.0, 0.0, 0.5])))
    T2 = np.eye(4)
    T2[:3, :3] = R2
    T2[:3, 3] = [4.0, -3.0, 1.5]
    s1, _ = sim.simulate_scan(world, T1, n_points=16384, noise=0.01, seed=1)
    s2, _ = sim.simulate_scan(world, T2, n_points=16384, noise=0.01, seed=2)
    drift = np.asarray(se3.se3_exp(jnp.array([0.0, 0.0, 0.15, 1.5, -1.0, 0.1])))
    w1 = s1 @ T1[:3, :3].T + T1[:3, 3]
    w1d = w1 @ drift[:3, :3].T + drift[:3, 3]
    w2 = s2 @ T2[:3, :3].T + T2[:3, 3]
    p1, m1 = sim.pad_cloud(w1d, 16384)
    p2, m2 = sim.pad_cloud(w2, 16384)
    va, vma = voxel.voxel_downsample(jnp.asarray(p1), jnp.asarray(m1), 0.3,
                                     out_cap=8192)
    vb, vmb = voxel.voxel_downsample(jnp.asarray(p2), jnp.asarray(m2), 0.3,
                                     out_cap=8192)
    vp1 = jnp.asarray((drift[:3, :3] @ T1[:3, 3] + drift[:3, 3]).astype(
        np.float32))
    vp2 = jnp.asarray(T2[:3, 3].astype(np.float32))
    return (va, vma, vp1), (vb, vmb, vp2)


def full_match(src, dst):
    """FPFH + Quatro coarse + GICP fine — the complete per-loop match
    (loop_closure.cpp:138-159 equivalent)."""
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import fpfh, gicp, quatro, se3

    (va, vma, vp1), (vb, vmb, vp2) = src, dst
    # k_feat=32 is validated at this workload's cloud sizes (>=8k points;
    # see QuatroConfig.fpfh_k_feat) and ~20% faster than the 48 default
    da, fa = fpfh.fpfh(va, vma, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=vp1, k_feat=32, k_normal=24)
    db, fb = fpfh.fpfh(vb, vmb, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=vp2, k_feat=32, k_normal=24)
    fa = fpfh.distinctive(da, fa)
    fb = fpfh.distinctive(db, fb)
    q = quatro.align(
        va, da, fa, vb, db, fb,
        noise_bound=jnp.float32(0.3), gnc_factor=jnp.float32(1.4),
        cost_diff_thr=jnp.float32(1e-4), distance_threshold=jnp.float32(35.0),
        max_corres=200, rot_max_iter=50)
    src_c = se3.transform_points(va, q.transform)
    fine = gicp.align(src_c, vma, vb, vmb, cov_backend="brute")
    T = se3.compose(fine.transform, q.transform)
    return T, fine.fitness, q.converged & fine.converged


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/flsq_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    src, dst = build_pair()
    run = jax.jit(lambda s, d: full_match(s, d))
    # NOTE: on the tunneled TPU platform block_until_ready does not reliably
    # block, so each timed iteration must end in a host read of the result.
    out = run(src, dst)
    float(out[1])  # compile + first run, forced to completion
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = run(src, dst)
        float(out[1])
        times.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(times))
    assert bool(out[2]), "benchmark match did not converge"
    print(json.dumps({
        "metric": "quatro_nano_gicp_loop_match_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
