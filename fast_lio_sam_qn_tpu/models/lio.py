"""LiDAR-inertial odometry front end — the FAST-LIO2 node replacement.

The reference launches ``fastlio_mapping`` as a separate ROS node
(third_party/fastlio_config_launch/kitti.launch:13) and consumes its
``/Odometry`` + ``/cloud_registered`` topics (fast_lio_sam_qn.cpp:75-76).
Here the front end is a device-resident filter object: `LIO.process_scan`
is one jitted program (propagate -> deskew -> iterated update -> map
insert) and returns exactly what the reference's PGO node consumes — the
scan-end pose and the deskewed scan — plus it keeps the deskewed cloud in
the BODY frame directly, skipping the reference's world-frame publish +
pose.inverse() un-transform round trip (pose_pcd.hpp:39-40).

Static shapes: scan points and per-scan IMU samples are padded to configured
capacities; preprocessing (blind-range cull, point_filter_num decimation,
filter_size_surf voxel downsample — kitti.yaml:13 / kitti.launch:7,9) is part
of the jitted program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashgrid, ieskf, se3, surfel_map, voxel
from ..utils.config import LioConfig


class LioState(NamedTuple):
    """Complete device-resident filter state (a pytree)."""

    nav: ieskf.NavState
    P: jax.Array
    grid: hashgrid.HashGrid
    t: jax.Array              # filter time (scan end), float32 seconds
    num_scans: jax.Array      # int32
    num_matches: jax.Array    # int32: plane matches in last update
    # LiDAR->IMU extrinsic. Fixed at the configured extrinsic_R/extrinsic_T
    # unless cfg.extrinsic_est_en, in which case it is filter state
    # co-estimated by the 24-dim IESEKF (appended last so pre-r5
    # checkpoints' leaf order is preserved; checkpoint.load fills it from
    # the template).
    ext: ieskf.Extrinsic


class ScanResult(NamedTuple):
    pose: jax.Array           # (4,4) world<-body at scan end
    cloud_body: jax.Array     # (N,3) deskewed scan, body frame
    cloud_mask: jax.Array     # (N,)
    num_matches: jax.Array
    intensity: jax.Array      # (N,) per-point intensity (the reference's
                              # pcl::PointXYZI channel, utilities.hpp:36;
                              # zeros when the source carries none)


class LIO:
    """Host-side handle owning config + the jitted per-scan step."""

    def __init__(self, cfg: Optional[LioConfig] = None, imu_cap: int = 64):
        self.cfg = cfg or LioConfig()
        self.imu_cap = imu_cap
        c = self.cfg
        self._R_li = jnp.asarray(
            np.array(c.extrinsic_R, np.float32).reshape(3, 3))
        self._t_li = jnp.asarray(np.array(c.extrinsic_T, np.float32))
        noise = [c.gyr_cov, c.acc_cov, c.b_gyr_cov, c.b_acc_cov]
        if c.extrinsic_est_en:
            noise += [c.extrinsic_rw_rot, c.extrinsic_rw_trans]
        self._noise = jnp.array(noise, jnp.float32)

    # ------------------------------------------------------------------
    def init_state(self, gravity_dir=None, gyro_bias=None, t0=0.0) -> LioState:
        """Fresh filter state. gravity_dir: mean accelerometer direction over
        an initial standstill (FAST-LIO-style init [external]); None assumes
        +z up."""
        nav = ieskf.identity_state()
        if gravity_dir is not None:
            g = -9.81 * jnp.asarray(gravity_dir) / jnp.linalg.norm(
                jnp.asarray(gravity_dir))
            nav = nav._replace(grav=g.astype(jnp.float32))
        if gyro_bias is not None:
            nav = nav._replace(bg=jnp.asarray(gyro_bias, jnp.float32))
        if self.cfg.map_backend == "surfel":
            grid = surfel_map.empty(
                res=self.cfg.filter_size_map,
                table_size=self.cfg.map_table_size)
        else:
            grid = hashgrid.empty(
                res=self.cfg.filter_size_map,
                table_size=self.cfg.map_table_size)
        return LioState(
            nav=nav,
            P=ieskf.init_covariance(
                est_extrinsic=self.cfg.extrinsic_est_en),
            grid=grid,
            t=jnp.float32(t0),
            num_scans=jnp.int32(0),
            num_matches=jnp.int32(0),
            ext=ieskf.Extrinsic(R=self._R_li, t=self._t_li),
        )

    @staticmethod
    def init_from_imu(gyro: np.ndarray, acc: np.ndarray):
        """Standstill init: returns (gravity_dir, gyro_bias) from raw samples."""
        return np.mean(acc, axis=0), np.mean(gyro, axis=0)

    @staticmethod
    def get_map_points(state: "LioState") -> np.ndarray:
        """The local map as an (N, 3) array — the FAST-LIO pcd_save_en
        equivalent (kitti.yaml:35). Surfel maps export voxel centroids."""
        occ = np.asarray(state.grid.occupied)
        if hasattr(state.grid, "points"):
            return np.asarray(state.grid.points)[occ]
        cnt = np.maximum(np.asarray(state.grid.count), 1.0)
        center = (np.asarray(state.grid.coords, np.float32) + 0.5) \
            * state.grid.res
        return (center + np.asarray(state.grid.psum) / cnt[:, None])[occ]

    # ------------------------------------------------------------------
    def preprocess(self, pts: jax.Array, rel_t: jax.Array, mask: jax.Array,
                   inten: jax.Array | None = None):
        """blind cull + decimation + surf downsample, fixed output capacity.
        Returns (pts, rel_t, inten, mask)."""
        if inten is None:
            inten = jnp.zeros(pts.shape[0], pts.dtype)
        return _preprocess(
            pts, rel_t, inten, mask,
            blind=self.cfg.blind,
            filter_num=self.cfg.point_filter_num,
            surf_res=self.cfg.filter_size_surf,
            out_cap=self.cfg.max_points_per_scan,
        )

    def process_scan(
        self,
        state: LioState,
        pts_l: jax.Array,    # (N,3) raw lidar-frame points (padded)
        rel_t: jax.Array,    # (N,) per-point time offsets from scan start
        mask: jax.Array,     # (N,)
        imu_t: jax.Array,    # (K,) absolute sample times in (t_prev, t_end]
        gyro: jax.Array,     # (K,3)
        acc: jax.Array,      # (K,3)
        imu_mask: jax.Array,  # (K,)
        t_start,
        t_end,
        inten: jax.Array | None = None,   # (N,) per-point intensity
    ) -> tuple[LioState, ScanResult]:
        return _process_scan(
            state, pts_l, rel_t, mask, imu_t, gyro, acc, imu_mask,
            jnp.float32(t_start), jnp.float32(t_end),
            self._noise, inten,
            est_extrinsic=self.cfg.extrinsic_est_en,
            blind=self.cfg.blind,
            filter_num=self.cfg.point_filter_num,
            surf_res=self.cfg.filter_size_surf,
            out_cap=self.cfg.max_points_per_scan,
            max_iter=self.cfg.max_iteration,
            plane_k=self.cfg.plane_k,
            plane_threshold=self.cfg.plane_threshold,
            det_range=self.cfg.det_range,
            map_backend=self.cfg.map_backend,
            surfel_window=self.cfg.surfel_query_window,
            surfel_hood_cap=self.cfg.surfel_hood_cap or None,
            surfel_hood_window=self.cfg.surfel_hood_window,
            surfel_halo_cap=self.cfg.surfel_halo_cap or None,
        )


@functools.partial(
    jax.jit, static_argnames=("blind", "filter_num", "surf_res", "out_cap"))
def _preprocess(pts, rel_t, inten, mask, *, blind, filter_num, surf_res,
                out_cap):
    n = pts.shape[0]
    r2 = jnp.sum(pts * pts, axis=-1)
    keep = mask & (r2 > blind * blind)
    if filter_num > 1:
        keep = keep & (jnp.arange(n) % filter_num == 0)
    # voxel downsample keeps centroids; per-point times need a representative
    # -> reuse the sort machinery but take the first point per voxel instead
    # of the centroid so its timestamp stays meaningful for deskew.
    scalars = jnp.stack([rel_t, inten], axis=-1)
    out_pts, out_s, out_mask = _first_per_voxel(
        pts, scalars, keep, surf_res, out_cap)
    return out_pts, out_s[:, 0], out_s[:, 1], out_mask


@functools.partial(jax.jit, static_argnames=("res", "out_cap"))
def _first_per_voxel(pts, scalars, mask, res, out_cap):
    """One representative (first-in-index) point per voxel, keeping its
    per-point scalars (timestamp, intensity) — the deskew-compatible
    analogue of voxel downsampling. scalars: (N, S)."""
    coords = voxel.voxel_coords(pts, res)
    h = voxel.spatial_hash(coords)
    key = jnp.where(mask, h, jnp.iinfo(jnp.int32).max)
    # lexicographic (hash, coords), stable — a hash-only sort can leave two
    # 31-bit-colliding voxels interleaved and emit duplicate heads for one
    # voxel (see voxel.voxel_downsample); stability keeps first-in-index
    # representatives so the kept timestamp stays meaningful
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0], key))
    pts_s, sc_s, coords_s, key_s, mask_s = (
        pts[order], scalars[order], coords[order], key[order], mask[order])
    prev_key = jnp.concatenate([key_s[:1] - 1, key_s[:-1]])
    prev_coords = jnp.concatenate([coords_s[:1] + 1, coords_s[:-1]])
    is_head = ((key_s != prev_key)
               | jnp.any(coords_s != prev_coords, -1)) & mask_s
    compact = jnp.argsort(jnp.logical_not(is_head), stable=True)
    out_pts = pts_s[compact]
    out_sc = sc_s[compact]
    out_m = is_head[compact]
    n = pts.shape[0]
    if out_cap <= n:
        return out_pts[:out_cap], out_sc[:out_cap], out_m[:out_cap]
    pad = out_cap - n
    return (jnp.pad(out_pts, ((0, pad), (0, 0))),
            jnp.pad(out_sc, ((0, pad), (0, 0))),
            jnp.pad(out_m, (0, pad)))


@functools.partial(jax.jit, static_argnames=(
    "est_extrinsic", "blind", "filter_num", "surf_res", "out_cap",
    "max_iter", "plane_k",
    "plane_threshold", "det_range", "map_backend", "surfel_window",
    "surfel_hood_cap", "surfel_hood_window", "surfel_halo_cap"))
def _process_scan(
    state: LioState, pts_l, rel_t, mask, imu_t, gyro, acc, imu_mask,
    t_start, t_end, noise, inten=None, *, est_extrinsic=False,
    blind, filter_num, surf_res, out_cap, max_iter, plane_k,
    plane_threshold, det_range, map_backend="surfel", surfel_window=1,
    surfel_hood_cap=None, surfel_hood_window=27, surfel_halo_cap=None,
):
    if inten is None:
        inten = jnp.zeros(pts_l.shape[0], pts_l.dtype)
    pts_p, t_p, i_p, m_p = _preprocess(
        pts_l, rel_t, inten, mask, blind=blind, filter_num=filter_num,
        surf_res=surf_res, out_cap=out_cap)

    nav1, P1, log = ieskf.propagate(
        state.nav, state.P, imu_t, gyro, acc, imu_mask, t_start, t_end, noise)
    # deskew with the CURRENT extrinsic estimate (= the configured R_li/t_li
    # unless est_extrinsic has moved it)
    body = ieskf.deskew(pts_p, t_p, m_p, log, nav1, t_start,
                        state.ext.R, state.ext.t)

    is_first = state.num_scans == 0

    if est_extrinsic:
        # scan-end LiDAR frame: undo the deskew-time extrinsic so the
        # update can re-apply its own extrinsic iterate differentiably
        pts_l_end = jnp.einsum("ni,ij->nj", body - state.ext.t, state.ext.R,
                               precision="highest")
        if map_backend == "surfel":
            def do_update(_):
                return ieskf.update_surfel_ext(
                    nav1, state.ext, P1, state.grid, pts_l_end, m_p,
                    meas_var=jnp.float32(0.0025), max_iter=max_iter,
                    window=surfel_window)
        else:
            def do_update(_):
                return ieskf.update_ext(
                    nav1, state.ext, P1, state.grid, pts_l_end, m_p,
                    meas_var=jnp.float32(0.0025),
                    plane_threshold=jnp.float32(plane_threshold),
                    max_iter=max_iter, plane_k=plane_k, window=3,
                )

        def skip_update(_):
            return nav1, state.ext, P1, jnp.int32(0)

        nav2, ext2, P2, matches = jax.lax.cond(
            is_first, skip_update, do_update, None)
        # the extrinsic compose chain needs the same SO(3) re-projection as
        # the nav chain (CLAUDE.md geometry rule), just at scan cadence
        ext2 = ieskf.Extrinsic(R=se3.orthonormalize3(ext2.R), t=ext2.t)
        # re-derive the body-frame cloud under the UPDATED extrinsic so
        # downstream keyframes see the consistent frame
        body = ieskf._ptransform(pts_l_end, ext2.R, ext2.t)
    else:
        if map_backend == "surfel":
            def do_update(_):
                return ieskf.update_surfel(
                    nav1, P1, state.grid, body, m_p,
                    meas_var=jnp.float32(0.0025), max_iter=max_iter,
                    window=surfel_window)
        else:
            def do_update(_):
                return ieskf.update(
                    nav1, P1, state.grid, body, m_p,
                    meas_var=jnp.float32(0.0025),
                    plane_threshold=jnp.float32(plane_threshold),
                    max_iter=max_iter, plane_k=plane_k, window=3,
                )

        def skip_update(_):
            return nav1, P1, jnp.int32(0)

        nav2, P2, matches = jax.lax.cond(is_first, skip_update, do_update,
                                         None)
        ext2 = state.ext
    # keep R on SO(3): the per-IMU-sample f32 compose chain drifts off the
    # manifold (~1e-4 ||R^T R - I|| per 500 scans) and transpose-inverses
    # downstream turn that into per-scan phantom rotation — see
    # se3.orthonormalize3. Once per scan keeps it at the f32 noise floor.
    nav2 = nav2._replace(R=se3.orthonormalize3(nav2.R))

    # map insert with the updated pose; evict far voxels to bound occupancy
    pts_w = ieskf._ptransform(body, nav2.R, nav2.p)
    if map_backend == "surfel":
        grid = surfel_map.evict_beyond(state.grid, nav2.p,
                                       jnp.float32(det_range * 1.5))
        grid = surfel_map.insert(grid, pts_w, m_p,
                                 thickness=jnp.float32(plane_threshold),
                                 hood_cap=surfel_hood_cap,
                                 halo_cap=surfel_halo_cap,
                                 hood_window=surfel_hood_window)
    else:
        grid = hashgrid.evict_beyond(state.grid, nav2.p,
                                     jnp.float32(det_range * 1.5))
        grid = hashgrid.insert(grid, pts_w, m_p)

    pose = se3.make_pose(nav2.R, nav2.p)
    new_state = LioState(
        nav=nav2, P=P2, grid=grid, t=t_end,
        num_scans=state.num_scans + 1, num_matches=matches, ext=ext2,
    )
    return new_state, ScanResult(pose, body, m_p, matches, i_p)
