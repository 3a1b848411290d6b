"""PGO pipeline orchestrator — the FastLioSamQn node replacement.

Behavioral mirror of the reference node (src/fast_lio_sam_qn.cpp), with the
4-thread AsyncSpinner + mutex quartet (main.cpp:10, fast_lio_sam_qn.h:61-62)
replaced by a deterministic single-writer event loop:

- ``feed``: the odomPcdCallback path (:86-201) — realtime pose composition
  from the odometry delta (:95-102), Euclidean keyframe gate (:498-501),
  odometry BetweenFactor + incremental optimization (:132-167), corrected
  pose/delta reset (:172-178), O(N) corrected-pose rewrite after loops
  (:180-188).
- the loop timer (:203-252) becomes a deterministic scheduler: ticks at
  1/loop_update_hz in DATA time; each tick inspects only the latest
  keyframe and marks it processed — reproducing the reference's documented
  lossy async semantics (keyframes between ticks are never loop-checked;
  README.md:23) without the race on keyframes_.back() (:205, unguarded).
- the vis timer's products are exposed as pull-style getters
  (get_trajectories, get_global_map) instead of rviz topics.

The pipeline consumes (pose, body cloud, timestamp) triples — exactly what
the reference consumes from FAST-LIO over ROS — either from our LIO front
end (models/lio.py) or from any external odometry source (parity mode).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pgo, se3, voxel
from ..utils.config import PipelineConfig
from . import keyframes as kf
from .loop_closure import LoopClosure


@dataclass
class LoopEvent:
    """Record of one loop-closure attempt (observability/export)."""

    tick_time: float
    query_idx: int
    closest_idx: int
    score: float
    accepted: bool


@jax.jit
def _feed_step(odom_delta, last_odom_pose, last_corrected, last_kf_corrected,
               pose):
    """One dispatch for the per-scan hot path: delta compose + realtime pose
    + keyframe-gate distance (fast_lio_sam_qn.cpp:95-102,498-501)."""
    delta = se3.compose(odom_delta,
                        se3.compose(se3.pose_inverse(last_odom_pose), pose))
    # odom_delta composes a rotation per scan and only resets at keyframes
    # (which are distance-gated: a stationary platform never resets it) —
    # re-project onto SO(3) once per step like the LIO chain, else
    # pose_inverse downstream turns the f32 manifold drift into phantom
    # rotation (CLAUDE.md geometry rule; se3.orthonormalize3 docstring)
    delta = delta.at[:3, :3].set(se3.orthonormalize3(delta[:3, :3]))
    corrected = se3.compose(last_corrected, delta)
    dist = se3.pose_distance(corrected, last_kf_corrected)
    return delta, corrected, dist


class FastLioSamQnPipeline:
    def __init__(self, cfg: Optional[PipelineConfig] = None, profiler=None,
                 mesh=None):
        """profiler: optional utils.profiling.Profiler; records the
        reference's stage spans (real/key_add/opt/res per callback,
        'loop' per timer firing — fast_lio_sam_qn.cpp:191-197,250).
        mesh: optional jax.sharding.Mesh — batched loop-closure mode
        (cfg.loop.loop_batch > 0) shards its candidate batch over it."""
        self.cfg = cfg or PipelineConfig()
        self.mesh = mesh
        from ..utils.profiling import Profiler

        self.profiler = profiler or Profiler()
        c = self.cfg
        self.loop_closure = LoopClosure(
            c.loop, src_cap=c.caps.src_points, dst_cap=c.caps.dst_points)
        self.store = kf.empty_store(c.caps.max_keyframes,
                                    c.caps.keyframe_points)
        self.graph = pgo.empty_graph(c.caps.max_keyframes,
                                     c.caps.max_loop_factors)
        self._prior_var = jnp.asarray(c.prior_variances, jnp.float32)
        self._odom_var = jnp.asarray(c.odom_variances, jnp.float32)

        self.initialized = False
        self.last_odom_pose = jnp.eye(4)
        self.odom_delta = jnp.eye(4)
        self.last_corrected_pose = jnp.eye(4)
        self.last_kf_corrected = jnp.eye(4)
        self.current_kf_idx = 0
        self.loop_added_flag = False
        # observability: how many per-keyframe solves took the factor-
        # sharded SPMD branch (spmd.pgo_optimize_full) vs single-device
        # (the multichip dryrun asserts the sharded branch engages)
        self.pgo_sharded_solves = 0
        self.pgo_single_solves = 0
        # most loop factors present in the graph during any sharded solve
        # (proves real loop factors flowed through the SPMD solver)
        self.pgo_sharded_loop_factors_max = 0
        self.latest_kf_processed = True
        self._kf_processed: List[bool] = []  # per-keyframe (batch mode)
        self._next_loop_tick: Optional[float] = None

        # consensus gating: accepted-but-uncommitted loops
        self._pending_loops: List[dict] = []

        if c.loop.loop_batch > 1:
            # AOT-warm the B-lane batch program now: the single-pending
            # fast path (_loop_tick_batched) otherwise defers its first
            # compile to the first tick with >=2 pending keyframes — a
            # multi-second mid-run stall on the real TPU
            self.loop_closure.warm_batch(
                self.store, self._batch_lanes(c.loop.loop_batch),
                mesh=self.mesh)

        # latest fed scan (device refs, no copy): the per-frame
        # /corrected_current_pcd product (fast_lio_sam_qn.cpp:104)
        self._last_cloud_body = None
        self._last_cloud_mask = None
        self._last_corrected = None

        # observability (host-side)
        self.realtime_poses: List[np.ndarray] = []  # /pose_stamped stream
        self.odom_poses: List[np.ndarray] = []      # raw odometry at KFs
        self.loop_events: List[LoopEvent] = []
        self.loop_idx_pairs: List[Tuple[int, int]] = []
        self.kf_timestamps: List[float] = []

    # ------------------------------------------------------------------
    def feed(self, pose, cloud_body, cloud_mask, timestamp: float,
             intensity=None):
        """One odom+cloud pair (the odomPcdCallback equivalent).

        pose: (4,4) odometry pose (world<-body); cloud_body: (P,3) padded
        body-frame points with mask; intensity: optional (P,) channel
        (PointXYZI parity). Returns the realtime corrected pose.
        """
        pose = jnp.asarray(pose, jnp.float32)
        if self._next_loop_tick is None:
            self._next_loop_tick = timestamp  # timer armed at first data

        # 0. fire loop-timer ticks due BEFORE this frame's data time — the
        # deterministic replay of the async timer (:203): a tick at t sees
        # only keyframes that existed strictly before t.
        period = 1.0 / self.cfg.loop_update_hz
        while self._next_loop_tick < timestamp:
            self._loop_tick(self._next_loop_tick)
            self._next_loop_tick += period

        # 1. realtime pose = last corrected * accumulated delta (:95-102).
        # Composed unconditionally like the reference (last_odom starts at
        # identity; the init branch does not reset the delta — it is reset
        # at the first keyframe optimization, :172-178). One fused dispatch.
        with self.profiler.span("real"):
            self.odom_delta, corrected_current, dist = _feed_step(
                self.odom_delta, self.last_odom_pose,
                self.last_corrected_pose, self.last_kf_corrected, pose)
            self.last_odom_pose = pose
            # ONE device pull per scan (CLAUDE.md one-dispatch rule):
            # fetch the realtime pose and the keyframe-gate scalar in a
            # single transfer instead of two blocking round-trips
            corrected_np, dist_np = jax.device_get((corrected_current, dist))
            self.realtime_poses.append(corrected_np)
            self._last_cloud_body = cloud_body
            self._last_cloud_mask = cloud_mask
            self._last_corrected = corrected_current

        if not self.initialized:
            self._add_keyframe(pose, pose, cloud_body,
                               cloud_mask, timestamp, first=True,
                               intensity=intensity)
            self.initialized = True
        else:
            # 2. keyframe gate on corrected poses (:498-501)
            if float(dist_np) > self.cfg.keyframe_threshold:
                with self.profiler.span("key_add"):
                    self._add_keyframe(pose, corrected_current, cloud_body,
                                       cloud_mask, timestamp, first=False,
                                       intensity=intensity)
                with self.profiler.span("opt"):
                    self._optimize_and_refresh()

        return corrected_current

    # ------------------------------------------------------------------
    def _add_keyframe(self, pose, corrected, cloud, mask, timestamp, first,
                      intensity=None):
        c = self.cfg
        if self.current_kf_idx >= self.store.capacity:
            # amortized growth: double the padded capacity (one recompile
            # at the new static shape) instead of crashing — SURVEY §5's
            # "amortized re-pad on overflow" for the keyframe stream
            new_cap = 2 * self.store.capacity
            self.store = kf.grow(self.store, new_cap)
            self.graph = pgo.grow(self.graph, max_nodes=new_cap)
            c.caps.max_keyframes = new_cap
        # store the body cloud voxelized at matching resolution (the
        # reference stores raw and voxelizes inside setSrcAndDstCloud; the
        # matching path re-voxelizes after world transform either way);
        # intensity is voxel-averaged alongside like pcl::VoxelGrid on
        # PointXYZI (utilities.hpp:38-63)
        if intensity is None:
            vc, vm = voxel.voxel_downsample(
                jnp.asarray(cloud), jnp.asarray(mask), c.loop.voxel_res,
                out_cap=c.caps.keyframe_points)
            vi = None
        else:
            vc, vm, vf = voxel.voxel_downsample(
                jnp.asarray(cloud), jnp.asarray(mask), c.loop.voxel_res,
                out_cap=c.caps.keyframe_points,
                feats=jnp.asarray(intensity)[:, None])
            vi = vf[:, 0]
        self.store = kf.append(self.store, vc, vm, pose, corrected,
                               jnp.float32(timestamp), intensity=vi)
        # keep the device array; np.asarray(pose) here is a blocking
        # device->host round trip (~26 ms on the tunnel) PER KEYFRAME in
        # integrated mode — get_trajectories pulls the stack lazily
        self.odom_poses.append(pose)
        self.kf_timestamps.append(float(timestamp))
        if first:
            self.graph = pgo.add_first_node(self.graph, pose)  # :112-118
        else:
            self.graph = pgo.add_odom_node(
                self.graph, self.last_kf_corrected, corrected)  # :132-143
        self.last_kf_corrected = corrected
        self.current_kf_idx += 1
        self.latest_kf_processed = False
        self._kf_processed.append(False)

    def _optimize_and_refresh(self):
        # reference: isam.update x2, x5 when a loop was added (:156-165)
        gn = 5 if self.loop_added_flag else 2
        n_factors = self.current_kf_idx + len(self.loop_idx_pairs) + 1
        if (self.mesh is not None and len(self.mesh.devices.flat) > 1
                and n_factors >= self.cfg.pgo_shard_min_factors):
            from ..parallel import spmd

            self.graph = spmd.pgo_optimize_full(
                self.mesh, self.graph, self._prior_var, self._odom_var,
                gn_iters=gn, pcg_iters=64,
                robust_delta=self.cfg.robust_delta)
            self.pgo_sharded_solves += 1
            self.pgo_sharded_loop_factors_max = max(
                self.pgo_sharded_loop_factors_max, len(self.loop_idx_pairs))
        else:
            self.graph = pgo.optimize(
                self.graph, self._prior_var, self._odom_var, gn_iters=gn,
                pcg_iters=64, robust_delta=self.cfg.robust_delta)
            self.pgo_single_solves += 1
        n = self.current_kf_idx
        last = self.graph.poses[n - 1]
        self.last_corrected_pose = last
        # last_kf_corrected must ALSO track the post-solve estimate: the
        # next odometry factor is meas = between(last_kf_corrected,
        # last_corrected_pose . delta), so a pre-solve anchor here bakes
        # the solve's movement of node n-1 into the measurement as a
        # phantom rotation, which the next solve then "corrects" — a
        # positive-feedback loop that amplified f32-level seeds into
        # 0.42 m / 0.094 rad of corrected-chain drift over 120 loop-free
        # keyframes (found by the round-5 long-run golden; the reference
        # equivalently re-reads the iSAM estimate for both the gate and
        # pose_from each callback, fast_lio_sam_qn.cpp:146-153,172-178).
        self.last_kf_corrected = last
        self.odom_delta = jnp.eye(4)
        if self.loop_added_flag:
            # O(N) corrected rewrite (:180-188); the keyframe gate then
            # compares against the rewritten latest pose. Without loops the
            # stored (as-inserted) value is kept, like the reference.
            self.store = kf.rewrite_corrected(self.store, self.graph.poses)
            self.loop_added_flag = False

    def _loop_tick(self, tick_time: float):
        """One loop-timer firing (:203-252). With loop_batch > 0, processes
        up to that many PENDING keyframes in one batched registration
        program (TPU-native extension; reference semantics are lossy)."""
        if not self.initialized or self.current_kf_idx == 0:
            return
        with self.profiler.span("loop"):
            self._loop_tick_inner(tick_time)

    def _loop_tick_inner(self, tick_time: float):
        batch = self.cfg.loop.loop_batch
        if batch > 0:
            self._loop_tick_batched(tick_time, batch)
            return
        if self.latest_kf_processed:
            return
        self.latest_kf_processed = True
        query_idx = self.current_kf_idx - 1
        self._kf_processed[query_idx] = True
        self._register_single_candidate(tick_time, query_idx)

    def _register_single_candidate(self, tick_time: float, query_idx: int):
        """Fetch + register + record one query keyframe through the FUSED
        tick program (shared by the lossy latest-keyframe path and the
        batched scheduler's one-pending fast path): candidate fetch,
        cond-gated registration, and the frozen graph measurement run as
        ONE dispatch, pulled in ONE transfer — split dispatch/pull
        sequences cost 3-4 tunnel round-trips per tick (~100 ms of the
        reference-shaped 135 ms tick measured in the round-5 bench)."""
        reg, meas = self.loop_closure.fetch_and_perform(
            self.store, query_idx)
        closest_np, valid_np, score_np, pose_np, meas_np = jax.device_get(
            (reg.closest_idx, reg.is_valid, reg.score, reg.pose_between,
             meas))
        closest_i = int(closest_np)
        if closest_i < 0:
            return
        accepted = bool(valid_np)
        self.loop_events.append(LoopEvent(
            tick_time, query_idx, closest_i, float(score_np), accepted))
        if accepted:
            self._consensus_commit(query_idx, closest_i, pose_np,
                                   float(score_np), meas=meas_np)

    def _consensus_commit(self, query_idx, closest_i, pose_between, score,
                          meas=None):
        """Commit a registration-accepted loop only when its implied drift
        correction agrees with another recent accepted loop (see
        LoopClosureConfig.consensus_window). With the window set to 0 the
        loop commits immediately (reference behavior).

        The loop MEASUREMENT is frozen at registration time — like the
        reference computes it inside the loop callback
        (fast_lio_sam_qn.cpp:224-233). pose_between is relative to the
        corrected poses the registration clouds were built with; a
        deferred (consensus-window) commit after an intervening
        rewrite_corrected would otherwise compose it with shifted poses
        and emit a factor off by the rewrite delta. The fused tick
        program already computed it (passed via meas); the batched path
        computes it here, same composition order: pose_from =
        reg.pose_between * query.corrected; meas =
        pose_from.between(closest.corrected)."""
        if meas is None:
            pose_from = se3.compose(
                jnp.asarray(pose_between, jnp.float32),
                self.store.poses_corrected[query_idx])
            pose_to = self.store.poses_corrected[closest_i]
            meas = se3.pose_between(pose_from, pose_to)
        w = self.cfg.loop.consensus_window
        if w <= 0:
            self._add_loop_factor(query_idx, closest_i, meas, score)
            return
        corr = np.asarray(pose_between)[:3, 3]
        entry = dict(query_idx=query_idx, closest_idx=closest_i,
                     meas=meas, score=score, corr=corr,
                     committed=False)
        # drop stale pendings
        self._pending_loops = [
            p for p in self._pending_loops
            if query_idx - p["query_idx"] <= w]
        tol = self.cfg.loop.consensus_tol
        agree = [p for p in self._pending_loops
                 if np.linalg.norm(p["corr"] - corr) < tol]
        if agree:
            for p in agree:
                if not p["committed"]:
                    self._add_loop_factor(p["query_idx"], p["closest_idx"],
                                          p["meas"], p["score"])
                    p["committed"] = True
            self._add_loop_factor(query_idx, closest_i, meas, score)
            entry["committed"] = True
        self._pending_loops.append(entry)

    def _add_loop_factor(self, query_idx, closest_i, meas, score):
        if len(self.loop_idx_pairs) >= self.graph.loop_i.shape[0]:
            # amortized growth instead of a silent drop (SURVEY §5)
            new_cap = 2 * self.graph.loop_i.shape[0]
            self.graph = pgo.grow(self.graph, max_loops=new_cap)
            self.cfg.caps.max_loop_factors = new_cap
        self.graph = pgo.add_loop_factor(
            self.graph, jnp.int32(query_idx), jnp.int32(closest_i),
            meas, score)
        self.loop_idx_pairs.append((query_idx, closest_i))
        self.loop_added_flag = True

    def _batch_lanes(self, batch: int) -> int:
        """Static lane count of the batched registration program: with a
        mesh, rounded up to a multiple of the mesh size (pad slots carry
        closest_idx = -1)."""
        if self.mesh is not None:
            ndev = len(self.mesh.devices.flat)
            batch = -(-batch // ndev) * ndev
        return batch

    def _loop_tick_batched(self, tick_time: float, batch: int):
        pending = [i for i, p in enumerate(self._kf_processed) if not p]
        pending = pending[:batch]
        if not pending:
            return
        for i in pending:
            self._kf_processed[i] = True
        self.latest_kf_processed = self._kf_processed[-1]

        if self.mesh is None and len(pending) == 1:
            # steady state is usually ONE pending keyframe per tick; the
            # B-lane batch program pays all B lanes regardless of padding,
            # so dispatch the (already-compiled) single-candidate program
            # instead — identical per-candidate math
            self._register_single_candidate(tick_time, pending[0])
            return

        batch = self._batch_lanes(batch)
        qidx = np.zeros(batch, np.int32)
        qidx[: len(pending)] = pending
        qposes = self.store.poses_corrected[jnp.asarray(qidx)]
        qtimes = self.store.timestamps[jnp.asarray(qidx)]
        closest = self.loop_closure.fetch_closest_batch(
            self.store, qposes, qtimes)
        closest_np = np.array(closest)  # writable copy
        closest_np[len(pending):] = -1  # pad slots: no candidate
        if (closest_np < 0).all():
            return
        reg = self.loop_closure.perform_loop_closure_batch(
            self.store, jnp.asarray(qidx), jnp.asarray(closest_np),
            mesh=self.mesh)
        # ONE blocking transfer for every per-lane result (CLAUDE.md
        # one-dispatch rule: each separate np.asarray pull costs a full
        # tunnel round trip; the commits below then run pull-free)
        valid, scores, poses_np = jax.device_get(
            (reg.is_valid, reg.score, reg.pose_between))
        for b in range(len(pending)):
            ci = int(closest_np[b])
            if ci < 0:
                continue
            accepted = bool(valid[b])
            self.loop_events.append(LoopEvent(
                tick_time, int(qidx[b]), ci, float(scores[b]), accepted))
            if accepted:
                self._consensus_commit(int(qidx[b]), ci,
                                       poses_np[b], float(scores[b]))

    # ------------------------------------------------------------------
    # vis-timer equivalents (pull-style)
    def get_trajectories(self):
        """(odom_poses (N,4,4), corrected_poses (N,4,4)) as numpy."""
        n = self.current_kf_idx
        odom = (np.asarray(jnp.stack(
            [jnp.asarray(p, jnp.float32) for p in self.odom_poses]))
            if n else np.zeros((0, 4, 4)))
        return odom, np.asarray(self.graph.poses[:n])

    def get_corrected_current_scan(self):
        """World-frame points of the LATEST fed scan at the realtime
        corrected pose — the per-callback /corrected_current_pcd product
        (fast_lio_sam_qn.cpp:104: transformPcd(current_frame_.pcd_,
        corrected)). Published every frame upstream, keyframe or not;
        exposed pull-style like the other vis products. Returns (K, 3)
        numpy (valid points only; empty before the first feed)."""
        if self._last_cloud_body is None:
            return np.zeros((0, 3), np.float32)
        world = se3.transform_points(
            jnp.asarray(self._last_cloud_body, jnp.float32),
            self._last_corrected)
        m = np.asarray(self._last_cloud_mask)
        return np.asarray(world)[m]

    def get_corrected_keyframe_poses(self):
        n = self.current_kf_idx
        return np.asarray(self.store.poses_corrected[:n])

    def get_global_map(self, voxel_res: Optional[float] = None):
        """Accumulate all keyframe clouds at corrected poses and voxelize
        (the corrected_map publisher path, :303-321)."""
        res = voxel_res or self.cfg.save_voxel_resolution
        n = self.current_kf_idx
        if n == 0:
            return np.zeros((0, 3), np.float32)
        world = se3.transform_points(
            self.store.clouds[:n], self.store.poses_corrected[:n])
        masks = self.store.cloud_masks[:n]
        flat = world.reshape(-1, 3)
        fmask = masks.reshape(-1)
        # start at 2^21 voxels and escalate on saturation: a full output
        # means the map may have been truncated (the downsample keeps a
        # hash-ordered subset). Occupied voxels never exceed valid input
        # points, so the escalation terminates. Export-only path — the
        # occasional recompile at a larger static cap is fine.
        cap = min(flat.shape[0], 1 << 21)
        while True:
            pts, m = voxel.voxel_downsample(flat, fmask, res, out_cap=cap)
            if int(jnp.sum(m)) < cap or cap >= flat.shape[0]:
                break
            cap = min(flat.shape[0], cap * 2)
        return np.asarray(pts)[np.asarray(m)]
