"""On-chip timing of `pgo.optimize` alone, across graph sizes.

The product fires `pgo.optimize` on EVERY keyframe (the reference's
isam.update x2, x5 after a loop — /root/reference/fast_lio_sam_qn/src/
fast_lio_sam_qn.cpp:156-165), so its cost curve over node count is the
scaling story of the whole per-scan budget.  bench.py measures it embedded
in the product at one size; this tool times the solver in isolation at
128 / 512 / 1024 nodes, x2 and x5 GN outer iterations, 64-iter PCG — the
production configuration — in two regimes:

* cold: every solve restarts from the dead-reckoned (drifted) odometry
  initial with all loop residuals live — the worst case (first solve after
  a big loop closure), PCG runs deep.
* warm: each solve continues from the previous optimum with a tiny new
  perturbation — the steady-state per-keyframe product case (warm-started
  relinearization; PCG early-exits on the relative-residual test).

Workload: a multi-lap drifted circle (1.6 m keyframe spacing, reference
noise vectors diag(1e-4 x3, 1e-2 x3), loop factors every 4th node across
laps with fitness-like variance 0.3).  Convergence sanity per size: a
chain of 20 production solves from the cold init must cut the ATE vs
ground truth (block-Jacobi PCG propagates corrections ~pcg_iters hops per
solve, so a SINGLE 64-iter solve cannot traverse a 1024-node chain — the
product converges across the per-keyframe solve cadence, not within one
call; iSAM2's direct sparse solve converges per-update instead, a
documented behavioral difference that washes out over a few keyframes).

Timing per CLAUDE.md: traced-trip-count fori_loop differencing
(amortized_ms) — cancels the tunnel dispatch floor; real data deps.

Usage: python -u -m fast_lio_sam_qn_tpu.tools.profile_pgo
"""
from __future__ import annotations

import sys

import numpy as np


LAP = 100          # nodes per lap (160 m circumference)
SPACING = 1.6      # m between keyframes (the kitti keyframe gate + margin)
PRIOR_VAR = (1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2)


def _yaw_pose(yaw: float, xyz) -> np.ndarray:
    T = np.eye(4, dtype=np.float64)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]
    T[:3, 3] = xyz
    return T


def build_graph(n_nodes: int, seed: int = 0):
    """Drifted multi-lap circle: returns (GraphState cold-initialized to the
    dead-reckoned trajectory, ground-truth poses (N,4,4))."""
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import pgo, se3

    rng = np.random.default_rng(seed)
    radius = LAP * SPACING / (2.0 * np.pi)
    gt = np.stack([
        _yaw_pose(2.0 * np.pi * k / LAP + np.pi / 2.0,
                  (radius * np.cos(2.0 * np.pi * k / LAP),
                   radius * np.sin(2.0 * np.pi * k / LAP), 0.0))
        for k in range(n_nodes)
    ])

    # noisy odometry measurements + dead-reckoned initials
    def exp6(xi):
        return np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)),
                          np.float64)

    odom_meas = np.broadcast_to(np.eye(4), (n_nodes, 4, 4)).copy()
    init = gt.copy()
    for k in range(1, n_nodes):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.concatenate([rng.normal(0, 0.002, 3),
                                rng.normal(0, 0.02, 3)])
        odom_meas[k] = rel @ exp6(noise)
        init[k] = init[k - 1] @ odom_meas[k]

    # loop factors: every 4th node of lap >= 1 back to the same azimuth on
    # the previous lap (the product's radius-gated revisit pattern)
    li, lj, lm = [], [], []
    for k in range(LAP, n_nodes, 4):
        j = k - LAP
        noise = np.concatenate([rng.normal(0, 0.001, 3),
                                rng.normal(0, 0.01, 3)])
        li.append(k)
        lj.append(j)
        lm.append(np.linalg.inv(gt[k]) @ gt[j] @ exp6(noise))
    n_loops = len(li)
    l_cap = max(1, n_loops)

    g = pgo.empty_graph(n_nodes, l_cap)
    g = g._replace(
        poses=jnp.asarray(init, jnp.float32),
        num_nodes=jnp.int32(n_nodes),
        prior_pose=jnp.asarray(gt[0], jnp.float32),
        odom_meas=jnp.asarray(odom_meas, jnp.float32),
        loop_i=jnp.asarray(li, jnp.int32),
        loop_j=jnp.asarray(lj, jnp.int32),
        loop_meas=jnp.asarray(np.stack(lm), jnp.float32),
        loop_var=jnp.full((l_cap,), 0.3, jnp.float32),
        num_loops=jnp.int32(n_loops),
    )
    return g, gt, n_loops


def _ate(poses, gt):
    return float(np.sqrt(np.mean(np.sum(
        (np.asarray(poses)[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=-1))))


def main():
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.setup()
    import jax
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import pgo
    from fast_lio_sam_qn_tpu.tools.profile_insert import amortized_ms

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    pvar = jnp.asarray(PRIOR_VAR, jnp.float32)

    rows = []
    for n_nodes in (128, 512, 1024):
        g, gt, n_loops = build_graph(n_nodes)
        init_poses = g.poses
        ate0 = _ate(g.poses, gt)

        for gn in (2, 5):
            # convergence sanity: 20 chained production solves (the
            # per-keyframe cadence) must cut the dead-reckoned ATE —
            # proves the timings below are of a real converging solve
            def chain(gg, k):
                return jax.lax.fori_loop(
                    0, k, lambda i, x: pgo.optimize(
                        x, pvar, pvar, gn_iters=gn, pcg_iters=64), gg)

            chained = jax.jit(chain, static_argnums=1)(g, 20)
            ate1 = _ate(chained.poses, gt)
            assert ate1 < 0.6 * ate0, (n_nodes, gn, ate0, ate1)

            def cold(gg, i):
                g2 = gg._replace(
                    poses=init_poses + i * 1e-9
                    + jnp.sum(gg.poses) * 1e-15)
                return pgo.optimize(g2, pvar, pvar, gn_iters=gn,
                                    pcg_iters=64)

            def warm(gg, i):
                g2 = gg._replace(
                    poses=gg.poses.at[n_nodes - 1, 0, 3].add(i * 1e-9))
                return pgo.optimize(g2, pvar, pvar, gn_iters=gn,
                                    pcg_iters=64)

            cold_ms = amortized_ms(cold, g)
            warm_ms = amortized_ms(warm, chained)
            rows.append((n_nodes, n_loops, gn, cold_ms, warm_ms,
                         ate0, ate1))
            print(f"nodes {n_nodes:5d}  loops {n_loops:3d}  gn x{gn}:  "
                  f"cold {cold_ms:7.2f} ms   warm {warm_ms:7.2f} ms   "
                  f"(ATE {ate0:.2f} -> {ate1:.3f} m over 20 chained)",
                  flush=True)

    print("\nnodes loops gn cold_ms warm_ms", flush=True)
    for n_nodes, n_loops, gn, c, w, *_ in rows:
        print(f"{n_nodes} {n_loops} {gn} {c:.2f} {w:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
