"""End-to-end runner — the `roslaunch fast_lio_sam_qn run.launch` equivalent.

Modes (mirroring how the reference is driven, README.md:83-94, minus ROS):

  python -m fast_lio_sam_qn_tpu.run --sim --out /tmp/out
      Synthetic closed-loop sequence through the FULL stack (our LIO front
      end + PGO + two-stage loop closure), then export + report.

  python -m fast_lio_sam_qn_tpu.run --scans DIR --poses poses.txt \
         [--stamps times.txt] --preset kitti --out /tmp/out
      Parity mode: external odometry (KITTI-format pose file) + scan files
      (.bin/.pcd, sorted) — exactly what the reference consumes from the
      FAST-LIO node over /Odometry + /cloud_registered. Scans must be in the
      BODY frame (the runner un-transforms world-frame clouds if
      --world-frame is passed, like pose_pcd.hpp:39-40).

  python -m fast_lio_sam_qn_tpu.run --kitti DIR --preset kitti --out /tmp/out
      Integrated mode: DIR contains scans/*.bin (KITTI velodyne), imu.txt
      ("t gx gy gz ax ay az" rows) and times.txt (scan timestamps); runs the
      LIO front end + PGO.

Checkpointing: --checkpoint PATH saves the full state (pipeline + LIO
filter) at the end of the run — and, with --checkpoint-every N, every N
scans. Integrated (--kitti) runs restore it with --resume PATH and
continue at the saved scan index (reference parity note: upstream has
output-only persistence, SURVEY §5; mid-run resume is a TPU-native
addition).
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys

import numpy as np



def _enable_compile_cache():
    """Persistent XLA compilation cache: the fused loop-closure program
    compiles in minutes on the remote-compile tunnel; cache it across runs."""
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.enable_compile_cache()


class RunObservers:
    """Mid-run observability — the reference's vis timer + /save_dir topic
    equivalents (fast_lio_sam_qn.cpp:254-325, :327):

    - --save-trigger PATH: when PATH appears, export full results to the
      directory named by its content (or PATH+'.out' if empty) and delete
      it — an any-time save request, like publishing to /save_dir.
    - --watch DIR: every 1/vis_hz of DATA time, dump the corrected
      trajectory, raw-odometry trajectory, and loop pairs into DIR —
      a pull-free live view replacing the 12 rviz publishers.
    - --watch DIR also serves the live global map with the reference's
      subscriber-gated semantics (/corrected_map is only built when someone
      subscribes, then the publisher re-arms, fast_lio_sam_qn.cpp:303-321):
      touch DIR/map.request and the next tick writes the voxelized
      corrected map to DIR/corrected_map.pcd and deletes the request file.
    """

    def __init__(self, args, vis_hz: float, save_voxel_res: float = 0.3):
        self.trigger = getattr(args, "save_trigger", None)
        self.watch = getattr(args, "watch", None)
        self.period = 1.0 / max(vis_hz, 1e-6)
        self.save_voxel_res = save_voxel_res
        self._next = None
        if self.watch:
            os.makedirs(self.watch, exist_ok=True)

    def tick(self, pipe, t: float):
        if self.trigger and os.path.exists(self.trigger):
            with open(self.trigger) as f:
                dest = f.read().strip() or (self.trigger + ".out")
            os.remove(self.trigger)
            from .utils.io import save_results

            save_results(pipe, dest)
            print(f"saved results to {dest} (trigger)", file=sys.stderr)
        if not self.watch:
            return
        req = os.path.join(self.watch, "map.request")
        if os.path.exists(req) and pipe.current_kf_idx > 0:
            # on-demand global map, then re-arm by consuming the request
            # (the /corrected_map subscriber-gated publish,
            # fast_lio_sam_qn.cpp:303-321)
            from .utils import io as _io

            pts = pipe.get_global_map(self.save_voxel_res)
            _io.save_pcd(os.path.join(self.watch, "corrected_map.pcd"), pts)
            os.remove(req)
        if self._next is None:
            self._next = t
        if t < self._next:
            return
        self._next += self.period
        from .utils import io as _io

        n = pipe.current_kf_idx
        if n == 0:
            return
        odom, corrected = pipe.get_trajectories()
        # latest corrected scan — the /corrected_current_pcd per-frame
        # product (fast_lio_sam_qn.cpp:104), at the watch cadence
        _io.save_pcd(os.path.join(self.watch, "corrected_current.pcd"),
                     pipe.get_corrected_current_scan())
        _io.save_poses_kitti(
            os.path.join(self.watch, "corrected_path.txt"), corrected)
        _io.save_poses_kitti(
            os.path.join(self.watch, "odom_path.txt"), odom)
        with open(os.path.join(self.watch, "loops.json"), "w") as f:
            json.dump({"pairs": pipe.loop_idx_pairs,
                       "keyframes": n, "t": t}, f)


def _get_pipeline_config(args, preset):
    """Preset config with the CLI's capacity overrides applied locally
    (no module-global patching: in-process main() calls must not leak
    --scan-cap/--table-size into later runs)."""
    from .configs.presets import get_pipeline_config

    if getattr(args, "ref_config", None):
        # load the reference's literal rosparam YAML with effective-value
        # semantics (typo'd keys fall back to code defaults) and, by
        # default, strict-parity gating — the `roslaunch ... run.launch`
        # config path (launch/run.launch:13). The PGO/loop side comes from
        # the YAML; the LIO front end still needs the per-dataset preset
        # (the reference runs FAST-LIO as a separate node with its own
        # yaml, kitti.launch:13).
        from .configs.presets import LIO_PRESETS
        from .utils.config import load_reference_yaml

        cfg = load_reference_yaml(
            args.ref_config,
            strict_parity=not getattr(args, "no_strict_parity", False))
        cfg.lio = dataclasses.replace(LIO_PRESETS[preset])
    else:
        cfg = get_pipeline_config(preset)
    if getattr(args, "lio_config", None):
        # a FAST-LIO per-dataset YAML layered over the preset's LIO config
        # (the reference's kitti.launch:13 `fastlio_mapping` yaml path)
        from .utils.config import load_lio_yaml

        cfg.lio = load_lio_yaml(args.lio_config, base=cfg.lio)
    over = {k: v for k, v in (
        ("max_points_per_scan", getattr(args, "scan_cap", None)),
        ("map_table_size", getattr(args, "table_size", None))) if v}
    if over:
        cfg.lio = dataclasses.replace(cfg.lio, **over)
    if getattr(args, "loop_batch", None) is not None:
        # an explicit `--loop-batch 0` keeps the reference's lossy
        # latest-keyframe timer semantics even when --devices builds a
        # mesh (a falsy check here would let --devices override it)
        cfg.loop.loop_batch = args.loop_batch
    elif getattr(args, "devices", None) and args.devices > 1:
        # a mesh with no explicit batch size: one candidate per device
        cfg.loop.loop_batch = args.devices
    return cfg


def _build_mesh(args):
    """--devices N: a jax.sharding.Mesh over the first N devices; the
    batched loop-closure program shards its candidate batch over it and
    the PGO solve switches to the factor-sharded program above
    cfg.pgo_shard_min_factors (parallel/spmd.py). None = single device."""
    n = getattr(args, "devices", None)
    if not n or n <= 1:
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(n)


def sim_lio_stream(cfg, world, traj, n_scans, scan_hz=5.0, prof=None):
    """Generate the sim sequence and run the LIO front end over it,
    yielding one (pose, cloud_body, cloud_mask, t1, gt_pose) tuple per
    scan — exactly what run_sim feeds the pipeline. Factored out so the
    golden-regression tests can run the (deterministic) sim+LIO stage
    ONCE and replay it into differently-configured pipelines."""
    import jax.numpy as jnp

    from .models.lio import LIO
    from .utils import sim
    from .utils.profiling import Profiler

    prof = prof or Profiler()
    lio = LIO(cfg.lio)
    period = 1.0 / scan_hz

    state = lio.init_state()
    T0 = traj.pose(0.0)
    v0, _, _ = traj.derivatives(0.0)
    state = state._replace(nav=state.nav._replace(
        v=jnp.asarray(T0[:3, :3].T @ v0, jnp.float32)))

    cap = cfg.lio.max_points_per_scan
    # simulate at 4x the processing capacity: a real spinning LiDAR has
    # hundreds-thousands of azimuth steps; the LIO preprocess voxel-
    # downsamples to `cap` (under-sampled sweeps leave the registration
    # landscape flat within +-0.5 m — measured)
    raw_n = 4 * cap
    T0_inv = np.linalg.inv(T0)
    for i in range(n_scans):
        t0, t1 = i * period, (i + 1) * period
        with prof.span("sim"):
            pts, rel_t = sim.simulate_scan_swept(
                world, traj, t0, n_points=raw_n, noise=0.01, seed=100 + i,
                scan_period=period)
            ts, gyro, acc = sim.simulate_imu(
                traj, t0, t1, rate=200.0, gyro_noise=0.002, acc_noise=0.02,
                seed=200 + i)
            cloud, mask = sim.pad_cloud(pts, raw_n)
            it = np.zeros(64, np.float32)
            ig = np.zeros((64, 3), np.float32)
            ia = np.zeros((64, 3), np.float32)
            im = np.zeros(64, bool)
            k = min(len(ts), 64)
            it[:k], ig[:k], ia[:k], im[:k] = ts[:k], gyro[:k], acc[:k], True
        with prof.span("lio"):
            state, res = lio.process_scan(
                state, jnp.asarray(cloud), jnp.asarray(rel_t),
                jnp.asarray(mask), jnp.asarray(it), jnp.asarray(ig),
                jnp.asarray(ia), jnp.asarray(im), t0, t1)
        yield res.pose, res.cloud_body, res.cloud_mask, t1, \
            T0_inv @ traj.pose(t1)


def run_sim(args):
    from .models.pipeline import FastLioSamQnPipeline
    from .utils import evaluation, sim
    from .utils.config import Capacities
    from .utils.profiling import Profiler

    cfg = _get_pipeline_config(args, "sim")
    cfg.caps = Capacities(max_keyframes=256, max_loop_factors=32,
                          keyframe_points=2048, src_points=2048,
                          dst_points=4096)
    prof = Profiler()
    obs = RunObservers(args, cfg.vis_hz, cfg.save_voxel_resolution)

    trajectory = getattr(args, "trajectory", "loop")
    if trajectory == "figure8":
        world = sim.World.room(size=40.0, height=6.0, n_boxes=16, seed=3)
        traj = sim.Trajectory.figure8(radius=12.0, period=60.0)
    elif trajectory == "corridor":
        # long-corridor stress (the BASELINE "Livox Avia ... long corridor"
        # scenario family): a sparse repetitive environment driven straight
        # through, with det_range tightened so the moving-window eviction
        # actively recycles voxel-table slots mid-run
        world = sim.World.corridor(length=150.0, width=8.0, height=4.0)
        traj = sim.Trajectory.straight(speed=2.0)
        cfg.lio = dataclasses.replace(cfg.lio, det_range=25.0)
    else:
        world = sim.World.room(size=26.0, height=5.0, n_boxes=10, seed=3)
        traj = sim.Trajectory.loop(radius=7.0, period=40.0)
    pipe = FastLioSamQnPipeline(cfg, mesh=_build_mesh(args))
    scan_hz = getattr(args, "scan_hz", None) or 5.0
    n_scans = args.n_scans or 240

    gt = []
    for i, (pose, cloud_body, cloud_mask, t1, gt_pose) in enumerate(
            sim_lio_stream(cfg, world, traj, n_scans, scan_hz, prof)):
        with prof.span("pgo"):
            pipe.feed(pose, cloud_body, cloud_mask, t1)
        obs.tick(pipe, t1)
        gt.append(gt_pose)
        if args.verbose and i % 25 == 0:
            print(f"scan {i}/{n_scans} kfs={pipe.current_kf_idx} "
                  f"loops={len(pipe.loop_idx_pairs)}", flush=True)
    period = 1.0 / scan_hz

    # evaluation against ground truth at keyframes
    _, corrected = pipe.get_trajectories()
    gt_kf = []
    gtn = np.stack(gt)
    for t in pipe.kf_timestamps:
        gt_kf.append(gtn[min(int(round(t / period)) - 1, len(gtn) - 1)])
    ate = evaluation.ate_rmse(corrected, np.stack(gt_kf))
    report = {
        "mode": "sim", "scans": n_scans, "keyframes": pipe.current_kf_idx,
        "loops_accepted": len(pipe.loop_idx_pairs),
        "loop_attempts": len(pipe.loop_events),
        "ate_rmse_m": round(ate, 4),
        "timing": prof.summary(),
    }
    return pipe, report


def _feed_scan_files(pipe, scan_paths, poses, stamps, world_frame, cap,
                     obs=None):
    import jax.numpy as jnp

    from .runtime import ScanLoader
    from .utils.sim import pad_cloud

    loader = ScanLoader(scan_paths, cap=1 << 18)
    for i, (T, t) in enumerate(zip(poses, stamps)):
        xyzi = loader.get(i)
        pts = xyzi[:, :3]
        inten = xyzi[:, 3]
        if world_frame:
            # un-transform world-frame clouds to body (pose_pcd.hpp:39-40)
            Tinv = np.linalg.inv(T)
            pts = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        if len(pts) > cap:  # uniform decimation to the configured capacity
            step = int(np.ceil(len(pts) / cap))
            pts, inten = pts[::step], inten[::step]
        cloud, mask = pad_cloud(pts.astype(np.float32), cap)
        ipad = np.zeros(cap, np.float32)
        ipad[: len(inten)] = inten[:cap]
        pipe.feed(jnp.asarray(T, jnp.float32), jnp.asarray(cloud),
                  jnp.asarray(mask), float(t),
                  intensity=jnp.asarray(ipad))
        if obs is not None:
            obs.tick(pipe, float(t))
    loader.close()


def run_parity(args):
    from .models.pipeline import FastLioSamQnPipeline
    from .utils import io
    from .utils.profiling import Profiler

    cfg = _get_pipeline_config(args, args.preset)
    pipe = FastLioSamQnPipeline(cfg, mesh=_build_mesh(args))
    prof = Profiler()
    scan_paths = sorted(
        glob.glob(os.path.join(args.scans, "*.bin"))
        + glob.glob(os.path.join(args.scans, "*.pcd")))
    poses = io.load_poses_kitti(args.poses)
    dropped = 0
    if args.odom_times:
        # ApproximateTime pairing of the two streams, exactly like the
        # reference's message_filters sync of /Odometry + /cloud_registered
        # (fast_lio_sam_qn.cpp:75-78): scans whose stamp has no odometry
        # stamp within --sync-slop are DROPPED, not index-paired.
        from .runtime import ApproxTimeSync

        if not args.stamps:
            raise SystemExit("--odom-times requires --stamps (scan stamps)")
        scan_t = np.loadtxt(args.stamps)[: len(scan_paths)]
        odom_t = np.loadtxt(args.odom_times)[: len(poses)]
        sync = ApproxTimeSync(slop=args.sync_slop)
        for i, t in enumerate(scan_t):
            sync.push_a(float(t), i)
        for j, t in enumerate(odom_t):
            sync.push_b(float(t), j)
        pairs = []
        while (p := sync.pop()) is not None:
            pairs.append(p)
        sync.close()
        scan_sel = [scan_paths[ia] for ia, _, _, _ in pairs]
        pose_sel = np.stack([poses[ib] for _, ib, _, _ in pairs]) if pairs \
            else np.zeros((0, 4, 4))
        # the callback's PosePcd record is stamped with the ODOM time
        stamps = np.asarray([tb for _, _, _, tb in pairs])
        n = len(pairs)
        dropped = len(scan_t) - n  # scans with no odometry within slop
    else:
        n = min(len(scan_paths), len(poses))
        scan_sel = scan_paths[:n]
        pose_sel = poses[:n]
        stamps = (np.loadtxt(args.stamps)[:n] if args.stamps
                  else np.arange(n) * 0.1)
    with prof.span("run"):
        _feed_scan_files(pipe, scan_sel, pose_sel, stamps,
                         args.world_frame, cfg.caps.keyframe_points,
                         obs=RunObservers(args, cfg.vis_hz, cfg.save_voxel_resolution))
    report = {
        "mode": "parity", "scans": n, "keyframes": pipe.current_kf_idx,
        "dropped_unmatched": dropped,
        "loops_accepted": len(pipe.loop_idx_pairs),
        "loop_attempts": len(pipe.loop_events),
        "timing": prof.summary(),
    }
    return pipe, report


def _pack_imu(rows, imu_cap: int = 64):
    """Pad IMU rows ``[t gx gy gz ax ay az]`` to the fixed device capacity."""
    it = np.zeros(imu_cap, np.float32)
    ig = np.zeros((imu_cap, 3), np.float32)
    ia = np.zeros((imu_cap, 3), np.float32)
    im = np.zeros(imu_cap, bool)
    k = min(len(rows), imu_cap)
    if k:
        r = np.asarray(rows)[:k]
        it[:k] = r[:, 0]
        ig[:k] = r[:, 1:4]
        ia[:k] = r[:, 4:7]
        im[:k] = True
    return it, ig, ia, im


def _extrinsic_report(cfg, state):
    """The refined LiDAR->IMU extrinsic, for runs with extrinsic_est_en
    (the calibration result a user enables the key for)."""
    if state is None or not cfg.lio.extrinsic_est_en:
        return None
    import numpy as np
    return {"R": np.round(np.asarray(state.ext.R), 6).tolist(),
            "t": np.round(np.asarray(state.ext.t), 6).tolist()}


def run_bag(args):
    """Direct bag streaming — the reference's `rosbag play seq.bag` driving
    path (/root/reference/README.md:83-94) without ROS or an intermediate
    bag_convert pass: BagReader -> decoders -> LIO + PGO pipeline, one
    message at a time, memory bounded by the scan/IMU look-ahead.

    With --odom-topic the bag's odometry drives the pipeline instead of our
    LIO front end (parity mode), the two streams paired by ApproxTimeSync
    exactly like the reference's message_filters sync
    (fast_lio_sam_qn.cpp:75-78)."""
    import jax.numpy as jnp

    from collections import deque

    from .models.lio import LIO
    from .models.pipeline import FastLioSamQnPipeline
    from .runtime.rosbag import BagReader, decode_imu, decode_odometry
    from .utils import sweep
    from .utils.profiling import Profiler
    from .utils.sim import pad_cloud

    cfg = _get_pipeline_config(args, args.preset)
    pipe = FastLioSamQnPipeline(cfg, mesh=_build_mesh(args))
    prof = Profiler()
    obs = RunObservers(args, cfg.vis_hz, cfg.save_voxel_resolution)
    reader = BagReader(args.bag)
    scan_topic = args.scan_topic
    imu_topic = args.imu_topic
    cap = cfg.lio.max_points_per_scan if not args.odom_topic \
        else cfg.caps.keyframe_points
    off = cfg.lio.time_offset_lidar_to_imu

    from .runtime.rosbag import scan_decoders as _scan_decoders

    scan_decoders = _scan_decoders(cfg.lio.timestamp_unit)

    if args.odom_topic:
        from .runtime import ApproxTimeSync

        sync = ApproxTimeSync(slop=args.sync_slop)
        scans, odoms = {}, {}
        na = nb = n_fed = 0
        drop_a = drop_b = 0     # messages the sync discarded unmatched
        next_a = next_b = 0     # ids below these are fed or dropped
        with prof.span("run"):
            for topic, mtype, trec, raw in reader.messages():
                if mtype in scan_decoders and scan_topic is None:
                    scan_topic = topic
                if topic == scan_topic and mtype in scan_decoders:
                    stamp, xyzi, _ = scan_decoders[mtype](raw)
                    scans[na] = xyzi
                    sync.push_a(stamp + off, na)
                    na += 1
                elif topic == args.odom_topic and \
                        mtype == "nav_msgs/Odometry":
                    stamp, T = decode_odometry(raw)
                    odoms[nb] = T
                    sync.push_b(stamp, nb)
                    nb += 1
                else:
                    continue
                while (p := sync.pop()) is not None:
                    ia_, ib_, _, tb = p
                    # the matcher consumes both queues front-to-back, so
                    # any buffered message with an id below the matched
                    # pair was silently discarded by the sync: free it
                    # (the dicts grow without bound otherwise) and count
                    # it (message_filters drops these the same way)
                    for j in range(next_a, ia_):
                        if scans.pop(j, None) is not None:
                            drop_a += 1
                    for j in range(next_b, ib_):
                        if odoms.pop(j, None) is not None:
                            drop_b += 1
                    next_a, next_b = ia_ + 1, ib_ + 1
                    xyzi = scans.pop(ia_)
                    T = odoms.pop(ib_)
                    pts, inten = xyzi[:, :3], xyzi[:, 3]
                    if args.world_frame:
                        Ti = np.linalg.inv(T)
                        pts = pts @ Ti[:3, :3].T + Ti[:3, 3]
                    if len(pts) > cap:
                        step = int(np.ceil(len(pts) / cap))
                        pts, inten = pts[::step], inten[::step]
                    cloud, mask = pad_cloud(pts.astype(np.float32), cap)
                    ipad = np.zeros(cap, np.float32)
                    ipad[: len(inten)] = inten[:cap]
                    pipe.feed(jnp.asarray(T, jnp.float32),
                              jnp.asarray(cloud), jnp.asarray(mask),
                              float(tb), intensity=jnp.asarray(ipad))
                    obs.tick(pipe, float(tb))
                    n_fed += 1
        sync.close()
        # tail messages never matched before end-of-stream count as
        # dropped too (total = everything decoded that was not fed)
        drop_a += len(scans)
        drop_b += len(odoms)
        return pipe, {
            "mode": "bag", "scans": n_fed,
            "dropped_unmatched": drop_a + drop_b,
            "keyframes": pipe.current_kf_idx,
            "loops_accepted": len(pipe.loop_idx_pairs),
            "loop_attempts": len(pipe.loop_events),
            "scan_topic": scan_topic, "odom_topic": args.odom_topic,
            "timing": prof.summary(),
        }

    lio = LIO(cfg.lio)
    state = None
    imu_rows: deque = deque()      # time-ordered [t gx gy gz ax ay az]
    imu_seen: list = []            # pre-init retention for gravity estimate
    pending: deque = deque()       # (t_eff, pts, inten, rel_or_None)
    last_t = None
    n_fed = 0

    # FAST-LIO2's time_sync_en (kitti.yaml:4 [external]): when the LiDAR
    # and IMU clocks disagree grossly (>0.1 s), estimate the constant
    # offset from the first stamp of each stream and remap LiDAR time onto
    # the IMU clock (applied on top of the configured
    # time_offset_lidar_to_imu, which handles *known* sub-0.1 s offsets).
    sync_off = None if cfg.lio.time_sync_en else 0.0
    first_scan_stamp = first_imu_stamp = None
    presync: deque = deque()       # scans held until sync_off is known

    def _resolve_sync(flush_unsynced: bool = False):
        nonlocal sync_off
        if sync_off is None:
            if flush_unsynced:
                sync_off = 0.0     # IMU-less bag: nothing to sync against
            elif first_scan_stamp is None or first_imu_stamp is None:
                return
            else:
                d = first_imu_stamp - first_scan_stamp
                sync_off = d if abs(d) > 0.1 else 0.0
                if sync_off:
                    print(f"time_sync_en: LiDAR->IMU clock offset "
                          f"{sync_off:+.3f} s detected from first stamps; "
                          "remapping scan stamps onto the IMU clock",
                          file=sys.stderr, flush=True)
        while presync:
            stamp, pts3, inten3, rel3 = presync.popleft()
            pending.append((stamp + off + sync_off, pts3, inten3, rel3))

    def drain(force: bool = False):
        nonlocal state, last_t, n_fed
        # a scan is ready once an IMU sample past its stamp has arrived
        # (or the bag ended): its (t0, t1] IMU window is then complete
        while pending and (force or
                           (imu_rows and imu_rows[-1][0] > pending[0][0])):
            t1, pts, inten, rel = pending.popleft()
            t0 = last_t if last_t is not None else t1 - 0.1
            if state is None:
                pre = [r for r in imu_seen if r[0] <= t1]
                init_rows = np.asarray(pre if len(pre) >= 5
                                       else imu_seen[:20] or
                                       [[t1, 0, 0, 0, 0, 0, 9.81]])
                gdir, bg = LIO.init_from_imu(init_rows[:, 1:4],
                                             init_rows[:, 4:7])
                state = lio.init_state(gravity_dir=gdir, gyro_bias=bg,
                                       t0=t0)
                imu_seen.clear()
            if rel is None:
                rel = sweep.synthesize_rel_times(
                    pts, t1 - t0, cfg.lio.lidar_type, cfg.lio.scan_line)
            if len(pts) > cap:
                step = int(np.ceil(len(pts) / cap))
                pts, rel, inten = pts[::step], rel[::step], inten[::step]
            cloud, mask = pad_cloud(pts.astype(np.float32), cap)
            ipad = np.zeros(cap, np.float32)
            ipad[: len(inten)] = inten[:cap]
            relp = np.zeros(cap, np.float32)
            relp[: len(rel)] = rel[:cap]
            window = []
            while imu_rows and imu_rows[0][0] <= t1:
                r = imu_rows.popleft()
                if r[0] > t0:
                    window.append(r)
            it, ig, ia_, im = _pack_imu(window)
            with prof.span("lio"):
                state, res = lio.process_scan(
                    state, jnp.asarray(cloud), jnp.asarray(relp),
                    jnp.asarray(mask), jnp.asarray(it), jnp.asarray(ig),
                    jnp.asarray(ia_), jnp.asarray(im), float(t0), float(t1),
                    inten=jnp.asarray(ipad))
            with prof.span("pgo"):
                pipe.feed(res.pose, res.cloud_body, res.cloud_mask,
                          float(t1), intensity=res.intensity)
            obs.tick(pipe, float(t1))
            last_t = t1
            n_fed += 1

    with prof.span("run"):
        for topic, mtype, trec, raw in reader.messages():
            if mtype in scan_decoders and scan_topic is None:
                scan_topic = topic
            if mtype == "sensor_msgs/Imu" and imu_topic is None:
                imu_topic = topic
            if topic == scan_topic and mtype in scan_decoders:
                with prof.span("decode"):
                    stamp, xyzi, rel = scan_decoders[mtype](raw)
                has_rel = rel is not None and len(rel) and \
                    float(rel.max()) > 0
                if sync_off is None:
                    if first_scan_stamp is None:
                        first_scan_stamp = stamp
                    presync.append((stamp, xyzi[:, :3], xyzi[:, 3],
                                    rel if has_rel else None))
                    _resolve_sync()
                else:
                    pending.append((stamp + off + sync_off, xyzi[:, :3],
                                    xyzi[:, 3], rel if has_rel else None))
            elif topic == imu_topic and mtype == "sensor_msgs/Imu":
                stamp, gyro, acc = decode_imu(raw)
                row = [stamp, *gyro, *acc]
                imu_rows.append(row)
                if state is None:
                    imu_seen.append(row)
                if first_imu_stamp is None:
                    first_imu_stamp = stamp
                    _resolve_sync()
            else:
                continue
            drain()
        _resolve_sync(flush_unsynced=True)
        drain(force=True)

    report = {
        "mode": "bag", "scans": n_fed, "keyframes": pipe.current_kf_idx,
        "loops_accepted": len(pipe.loop_idx_pairs),
        "loop_attempts": len(pipe.loop_events),
        "scan_topic": scan_topic, "imu_topic": imu_topic,
        "timing": prof.summary(),
    }
    if cfg.lio.time_sync_en:
        report["time_sync_offset"] = round(float(sync_off or 0.0), 6)
    if (ext := _extrinsic_report(cfg, state)) is not None:
        report["extrinsic_estimate"] = ext
    return pipe, report


def run_kitti(args):
    import jax.numpy as jnp

    from .models.lio import LIO
    from .models.pipeline import FastLioSamQnPipeline
    from .runtime import ScanLoader
    from .utils import sweep
    from .utils.profiling import Profiler
    from .utils.sim import pad_cloud

    cfg = _get_pipeline_config(args, args.preset)
    pipe = FastLioSamQnPipeline(cfg, mesh=_build_mesh(args))
    lio = LIO(cfg.lio)
    prof = Profiler()
    obs = RunObservers(args, cfg.vis_hz, cfg.save_voxel_resolution)

    scan_paths = sorted(glob.glob(os.path.join(args.kitti, "scans", "*.bin")))
    stamps = np.loadtxt(os.path.join(args.kitti, "times.txt"))
    # lidar stamps onto the IMU clock (kimera-multi.yaml:6)
    stamps = stamps + cfg.lio.time_offset_lidar_to_imu
    imu = np.loadtxt(os.path.join(args.kitti, "imu.txt"))  # t gx gy gz ax..az
    n = min(len(scan_paths), len(stamps))
    if args.n_scans:
        n = min(n, args.n_scans)

    # gravity/bias init from pre-motion IMU (FAST-LIO-style standstill init)
    pre = imu[imu[:, 0] <= stamps[0]]
    init_rows = pre if len(pre) >= 5 else imu[:20]
    gdir, bg = LIO.init_from_imu(init_rows[:, 1:4], init_rows[:, 4:7])
    state = lio.init_state(gravity_dir=gdir, gyro_bias=bg, t0=stamps[0])

    start = 0
    if getattr(args, "resume", None):
        from .utils.checkpoint import load_checkpoint

        pipe, st, extra = load_checkpoint(pipe, args.resume,
                                          lio_template=state)
        if st is None:
            raise SystemExit(
                f"{args.resume} holds no LIO state; re-save with a recent "
                "--checkpoint")
        state = st
        start = int(extra.get("scan_index", 0))

    loader = ScanLoader(scan_paths[:n], cap=1 << 18)
    cap = cfg.lio.max_points_per_scan
    imu_cap = 64
    for i in range(start, n):
        t1 = stamps[i]
        t0 = stamps[i - 1] if i else t1 - 0.1
        with prof.span("io"):
            xyzi = loader.get(i)
            pts = xyzi[:, :3].astype(np.float32)
            inten = xyzi[:, 3].astype(np.float32)
            # true per-point sweep times when the dataset carries them
            # (rel_times/ sidecar from bag_convert), else synthesized by
            # the configured lidar pattern (utils/sweep.py)
            rel = sweep.load_rel_times(args.kitti, i, len(pts))
            if rel is None:
                rel = sweep.synthesize_rel_times(
                    pts, t1 - t0, cfg.lio.lidar_type, cfg.lio.scan_line)
            if len(pts) > cap:
                step = int(np.ceil(len(pts) / cap))
                pts, rel, inten = pts[::step], rel[::step], inten[::step]
            cloud, mask = pad_cloud(pts, cap)
            ipad = np.zeros(cap, np.float32)
            ipad[: len(inten)] = inten[:cap]
            rows = imu[(imu[:, 0] > t0) & (imu[:, 0] <= t1)][:imu_cap]
            it = np.zeros(imu_cap, np.float32)
            ig = np.zeros((imu_cap, 3), np.float32)
            ia = np.zeros((imu_cap, 3), np.float32)
            im = np.zeros(imu_cap, bool)
            k = len(rows)
            if k:
                it[:k] = rows[:, 0]
                ig[:k] = rows[:, 1:4]
                ia[:k] = rows[:, 4:7]
                im[:k] = True
            relp = np.zeros(cap, np.float32)
            relp[: len(rel)] = rel[:cap] if len(rel) > cap else rel
        with prof.span("lio"):
            state, res = lio.process_scan(
                state, jnp.asarray(cloud), jnp.asarray(relp),
                jnp.asarray(mask), jnp.asarray(it), jnp.asarray(ig),
                jnp.asarray(ia), jnp.asarray(im), float(t0), float(t1),
                inten=jnp.asarray(ipad))
        with prof.span("pgo"):
            pipe.feed(res.pose, res.cloud_body, res.cloud_mask, float(t1),
                      intensity=res.intensity)
        obs.tick(pipe, float(t1))
        if args.checkpoint and args.checkpoint_every and \
                (i + 1) % args.checkpoint_every == 0:
            from .utils.checkpoint import save_checkpoint

            save_checkpoint(pipe, args.checkpoint, lio_state=state,
                            extra={"scan_index": i + 1})
        if args.verbose and i % 50 == 0:
            print(f"scan {i}/{n} kfs={pipe.current_kf_idx} "
                  f"matches={int(res.num_matches)}", flush=True)
    loader.close()
    if args.checkpoint:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(pipe, args.checkpoint, lio_state=state,
                        extra={"scan_index": n})
    report = {
        "mode": "kitti", "scans": n, "keyframes": pipe.current_kf_idx,
        "resumed_at": start or None,
        "loops_accepted": len(pipe.loop_idx_pairs),
        "timing": prof.summary(),
    }
    if args.checkpoint:
        report["checkpoint"] = args.checkpoint
    if (ext := _extrinsic_report(cfg, state)) is not None:
        report["extrinsic_estimate"] = ext
    return pipe, report


def _apply_platform_override():
    """Honor FLSQ_PLATFORM (e.g. "cpu") before the jax backend initializes
    (see utils/jaxenv.py for why JAX_PLATFORMS is not reliable here)."""
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.apply_platform_override()


def main(argv=None):
    _apply_platform_override()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sim", action="store_true")
    p.add_argument("--kitti", help="KITTI-style dataset dir")
    p.add_argument("--bag",
                   help="ROS bag file: stream it straight into the pipeline "
                        "(the `rosbag play` driving path, README.md:83-94) "
                        "— LIO+PGO by default, or odometry-driven parity "
                        "with --odom-topic")
    p.add_argument("--scan-topic", default=None,
                   help="--bag: scan topic, PointCloud2 or livox "
                        "CustomMsg (default: first found)")
    p.add_argument("--imu-topic", default=None,
                   help="--bag: Imu topic (default: first found)")
    p.add_argument("--odom-topic", default=None,
                   help="--bag: drive the pipeline from this nav_msgs/"
                        "Odometry topic instead of the LIO front end")
    p.add_argument("--scans", help="scan dir for parity mode")
    p.add_argument("--poses", help="KITTI-format odometry pose file")
    p.add_argument("--stamps", help="timestamps file (one float per scan)")
    p.add_argument("--odom-times",
                   help="parity mode: odometry timestamps file; pairs the "
                        "scan/odom streams via ApproximateTime sync and "
                        "drops unmatched frames (fast_lio_sam_qn.cpp:75-78)")
    p.add_argument("--sync-slop", type=float, default=0.05,
                   help="max |scan_t - odom_t| for an ApproximateTime pair")
    p.add_argument("--world-frame", action="store_true",
                   help="scans are world-frame (un-transform by pose)")
    p.add_argument("--preset", default="kitti")
    p.add_argument("--lio-config", default=None, dest="lio_config",
                   help="FAST-LIO per-dataset YAML layered over the "
                        "preset's LIO config (fastlio_config_launch/*.yaml "
                        "format)")
    p.add_argument("--ref-config", default=None, dest="ref_config",
                   help="load the PGO/loop config from a reference-format "
                        "rosparam YAML (e.g. the upstream config/"
                        "config.yaml) with effective-value semantics and "
                        "strict-parity gating; --preset still selects the "
                        "LIO front-end tuning")
    p.add_argument("--no-strict-parity", action="store_true",
                   dest="no_strict_parity",
                   help="with --ref-config: keep the TPU-native robustness "
                        "gates (consensus window, degeneracy gate, Huber) "
                        "instead of reference-exact acceptance")
    p.add_argument("--out", default=None, help="export directory")
    p.add_argument("--no-auto-save", action="store_true",
                   help="skip the shutdown auto-save: without --out, runs "
                        "export to ./results/<seq_name> whenever the "
                        "config's save flags are set, like the reference "
                        "destructor (fast_lio_sam_qn.cpp:415-450)")
    p.add_argument("--plot", default=None, help="write a trajectory/map PNG")
    p.add_argument("--save-trigger", default=None,
                   help="mid-run save request file: when it appears, export "
                        "results to the directory it names and delete it "
                        "(the /save_dir topic equivalent, "
                        "fast_lio_sam_qn.cpp:327)")
    p.add_argument("--watch", default=None,
                   help="directory for incremental trajectory/loop dumps "
                        "every 1/vis_hz of data time (live observability)")
    p.add_argument("--checkpoint", default=None,
                   help="save the full state (pipeline + LIO) here at the "
                        "end of the run; with --checkpoint-every, also "
                        "periodically")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="integrated mode: save --checkpoint every N scans")
    p.add_argument("--resume", default=None,
                   help="integrated (--kitti) mode: restore pipeline + LIO "
                        "state from this checkpoint and continue at its "
                        "saved scan index")
    p.add_argument("--n-scans", type=int, default=None)
    p.add_argument("--scan-cap", type=int, default=None,
                   help="override lio.max_points_per_scan (static device "
                        "capacity); small values cut compile time for "
                        "smoke runs without changing preset semantics")
    p.add_argument("--table-size", type=int, default=None,
                   help="override lio.map_table_size (voxel-hash slots)")
    p.add_argument("--loop-batch", type=int, default=None, dest="loop_batch",
                   help="process up to N pending keyframes per loop tick as "
                        "ONE batched registration program (0/absent = "
                        "reference latest-keyframe-only semantics); with "
                        "--devices the batch is sharded over the mesh")
    p.add_argument("--devices", type=int, default=None,
                   help="build a jax.sharding.Mesh over the first N devices "
                        "and shard the loop-closure batch + (above "
                        "pgo_shard_min_factors) the PGO solve over it")
    p.add_argument("--trajectory", default="loop",
                   choices=["loop", "figure8", "corridor"])
    p.add_argument("--scan-hz", type=float, default=None, dest="scan_hz")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)

    if args.resume and not args.kitti:
        p.error("--resume is supported in integrated (--kitti) mode")
    _enable_compile_cache()
    if args.sim:
        pipe, report = run_sim(args)
    elif args.kitti:
        pipe, report = run_kitti(args)
    elif args.bag:
        pipe, report = run_bag(args)
    elif args.scans and args.poses:
        pipe, report = run_parity(args)
    else:
        p.error("pick a mode: --sim | --kitti DIR | --bag FILE | "
                "--scans DIR --poses F")

    if args.checkpoint and "checkpoint" not in report:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(pipe, args.checkpoint)
        report["checkpoint"] = args.checkpoint
    cfgp = pipe.cfg
    if args.out:
        from .utils.io import save_results

        out_dir = save_results(pipe, args.out)
        report["exported_to"] = out_dir
    elif not args.no_auto_save and (
            cfgp.save_map_pcd or cfgp.save_map_bag or
            cfgp.save_in_kitti_format):
        # reference destructor parity: results are saved on shutdown
        # whenever the save flags are set, --out or not
        # (fast_lio_sam_qn.cpp:415-450)
        from .utils.io import save_results

        out_dir = save_results(pipe, "results")
        report["exported_to"] = out_dir
    if args.plot:
        from .utils.viz import plot_results

        report["plot"] = plot_results(pipe, args.plot)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
