"""KITTI-scale long-run sequence: definition + replay (round-4 verdict #2).

Every prior end-to-end validation ran at toy scale (240 scans / 35
keyframes / 26 m room).  The reference's empirical case is multi-km
dataset runs (/root/reference/README.md:25-38, KITTI 05 = ~2,761 scans /
2.2 km); this module defines a scale-realistic synthetic stand-in and a
replay that exercises, together and end-to-end, everything toy scale
cannot:

* >= 1,600 scans over a ~650 m multi-lap course with continuous revisits
  (every lap re-passes the whole previous lap within the 35 m loop radius
  and past the 30 s timediff gate);
* mid-run amortized DOUBLING of BOTH growth paths — the keyframe store
  starts at 128 (~400 keyframes arrive: two doublings) and the loop-factor
  capacity starts at 8 (dozens of committed loops: two+ doublings);
* the O(N) corrected-pose rewrite at N in the hundreds after every loop;
* per-keyframe pgo.optimize at N up to ~400 nodes on a live graph;
* surfel-map eviction churn: det_range 40 m on a 52 m-diameter course —
  the moving window continuously evicts behind the sensor and re-claims
  the same world on the next lap;
* loop gating over a dense candidate field (every keyframe of every
  earlier lap is a candidate; the same-lap tail is excluded by the
  timediff gate — chord distance at 30 s arc-age is ~38 m > radius 35).

The definition lives in the package so the slow CPU-mesh golden
(tests/test_golden_longrun.py) and the on-TPU run (this module's main)
drive the IDENTICAL sequence. Scan/map capacities are reduced from the
kitti preset (2048-pt scans, 2^17-slot map at 0.5 m) so the CPU golden
stays buildable; the graph/pipeline scale — where the untested behavior
lives — is the real thing.

Usage (the v5e run recorded in PARITY.md):
    python -u -m fast_lio_sam_qn_tpu.tools.longrun [--scans N]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

N_SCANS = 1600
SCAN_HZ = 10.0
RADIUS = 26.0          # lap = 163.4 m; 1600 scans @ 4 m/s = 3.9 laps, 640 m
SPEED = 4.0
WORLD_SIZE = 110.0     # course fits with margin; far walls beyond max_range


def longrun_config():
    """Pipeline config for the long run: sim LIO preset at reduced scan/map
    capacities, det_range tightened for eviction churn, small initial
    keyframe/loop capacities so growth doublings happen mid-run."""
    from ..configs.presets import get_pipeline_config
    from ..utils.config import Capacities

    cfg = get_pipeline_config("sim")
    cfg.lio = dataclasses.replace(
        cfg.lio, det_range=40.0, max_points_per_scan=2048,
        map_table_size=1 << 17, filter_size_surf=0.5, filter_size_map=0.5)
    cfg.caps = Capacities(max_keyframes=128, max_loop_factors=8,
                          keyframe_points=2048, src_points=2048,
                          dst_points=4096)
    # 0.5 Hz data-time loop cadence: ~60 registration attempts across laps
    # 2-4 (the reference's lossy latest-keyframe-only semantics make the
    # attempt count a scheduling choice, README.md:23)
    cfg.loop_update_hz = 0.5
    return cfg


def longrun_world_traj():
    from ..utils import sim

    world = sim.World.room(size=WORLD_SIZE, height=6.0, n_boxes=36, seed=11)
    period = 2.0 * np.pi * RADIUS / SPEED
    traj = sim.Trajectory.loop(radius=RADIUS, period=period)
    return world, traj


def longrun_feed(cfg, n_scans=N_SCANS, prof=None):
    """The deterministic sim+LIO stream for the long course (numpy items,
    picklable for the test cache)."""
    from ..run import sim_lio_stream

    world, traj = longrun_world_traj()
    for item in sim_lio_stream(cfg, world, traj, n_scans, SCAN_HZ,
                               prof=prof):
        yield tuple(np.asarray(x) if hasattr(x, "shape") else x
                    for x in item)


def replay(cfg, feed, prof=None):
    """Drive the pipeline over the feed; return the golden summary dict.

    Asserts (not just reports) the structural properties the long run
    exists to exercise: both capacity doublings crossed mid-run."""
    import jax.numpy as jnp

    from ..models.pipeline import FastLioSamQnPipeline
    from ..utils import evaluation

    kf0 = cfg.caps.max_keyframes
    lf0 = cfg.caps.max_loop_factors
    pipe = FastLioSamQnPipeline(cfg, profiler=prof)
    gt = []
    for pose, cloud, mask, t1, gt_pose in feed:
        pipe.feed(jnp.asarray(pose), jnp.asarray(cloud), jnp.asarray(mask),
                  float(t1))
        gt.append(gt_pose)

    period = 1.0 / SCAN_HZ
    gtn = np.stack(gt)
    gt_kf = np.stack([gtn[min(int(round(t / period)) - 1, len(gtn) - 1)]
                      for t in pipe.kf_timestamps])
    raw, corrected = pipe.get_trajectories()
    ate = float(evaluation.ate_rmse(corrected, gt_kf))
    ate_odom = float(evaluation.ate_rmse(raw, gt_kf))

    assert pipe.store.capacity > kf0, (
        f"keyframe store never grew past {kf0} ({pipe.store.capacity})")
    assert pipe.graph.loop_i.shape[0] > lf0, (
        f"loop-factor capacity never grew past {lf0}")
    return {
        "n_keyframes": int(pipe.current_kf_idx),
        "ate_corrected_m": round(ate, 4),
        "ate_odom_m": round(ate_odom, 4),
        "loops_committed": len(pipe.loop_idx_pairs),
        "loop_attempts": len(pipe.loop_events),
        "loops_accepted": sum(1 for e in pipe.loop_events if e.accepted),
        "kf_capacity_final": int(pipe.store.capacity),
        "loop_capacity_final": int(pipe.graph.loop_i.shape[0]),
        "kf_capacity_initial": kf0,
        "loop_capacity_initial": lf0,
    }


def main(argv=None):
    import argparse

    from ..utils import jaxenv

    jaxenv.setup()
    import jax

    from ..utils.profiling import Profiler

    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=N_SCANS)
    args = ap.parse_args(argv)

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cfg = longrun_config()
    prof = Profiler()
    t0 = time.perf_counter()
    summary = replay(cfg, longrun_feed(cfg, args.scans, prof=prof),
                     prof=prof)
    wall = time.perf_counter() - t0
    dist = args.scans / SCAN_HZ * SPEED
    print(f"long run: {args.scans} scans / {dist:.0f} m in {wall:.0f} s "
          f"wall ({wall / args.scans * 1e3:.1f} ms/scan incl. host sim gen)",
          flush=True)
    for k, v in summary.items():
        print(f"  {k}: {v}", flush=True)
    stats = prof.stats
    if stats:
        line = "  stage avgs: " + "  ".join(
            f"{k}={v.avg_ms:.1f}ms" for k, v in sorted(stats.items()))
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
