import jax.numpy as jnp
import numpy as np
import pytest

from fast_lio_sam_qn_tpu.models.lio import LIO
from fast_lio_sam_qn_tpu.ops import ieskf, se3
from fast_lio_sam_qn_tpu.utils import sim
from fast_lio_sam_qn_tpu.utils.config import LioConfig

SCAN_HZ = 10.0
IMU_HZ = 200.0
IMU_CAP = 32


def _pad_imu(ts, gyro, acc, t0, cap=IMU_CAP):
    k = len(ts)
    t = np.zeros(cap, np.float32)
    g = np.zeros((cap, 3), np.float32)
    a = np.zeros((cap, 3), np.float32)
    m = np.zeros(cap, bool)
    t[:k] = ts - 0.0
    g[:k] = gyro
    a[:k] = acc
    m[:k] = True
    return jnp.asarray(t), jnp.asarray(g), jnp.asarray(a), jnp.asarray(m)


def test_imu_propagation_tracks_truth():
    """Pure propagation over one scan interval matches the analytic traj."""
    traj = sim.Trajectory.loop(radius=7.0, period=30.0)
    t0, t1 = 2.0, 2.1
    ts, gyro, acc = sim.simulate_imu(traj, t0, t1, rate=IMU_HZ)
    # exact initial state from the trajectory
    T0 = traj.pose(t0)
    v0, _, _ = traj.derivatives(t0)
    nav = ieskf.identity_state()._replace(
        R=jnp.asarray(T0[:3, :3], jnp.float32),
        p=jnp.asarray(T0[:3, 3], jnp.float32),
        v=jnp.asarray(v0, jnp.float32),
    )
    it, ig, ia, im = _pad_imu(ts, gyro, acc, t0)
    nav1, P1, log = ieskf.propagate(
        nav, ieskf.init_covariance(), it, ig, ia, im,
        jnp.float32(t0), jnp.float32(t1),
        jnp.array([0.1, 0.1, 1e-4, 1e-4]),
    )
    T1 = traj.pose(t1)
    np.testing.assert_allclose(np.asarray(nav1.p), T1[:3, 3], atol=2e-3)
    rot_err = se3.so3_log(
        jnp.asarray(T1[:3, :3].T, jnp.float32) @ nav1.R)
    assert float(jnp.linalg.norm(rot_err)) < 2e-3
    # covariance grew
    assert float(jnp.trace(P1)) > float(jnp.trace(ieskf.init_covariance()))


def _surface_distance(world, pts_w):
    """Distance from each point to the nearest world surface (in-extent
    normal projection; out-of-extent projections excluded)."""
    best = np.full(len(pts_w), np.inf)
    for (o, u, v) in world.surfaces:
        n = np.cross(u, v)
        n = n / np.linalg.norm(n)
        rel = pts_w - o[None]
        dist = np.abs(rel @ n)
        a = (rel @ u) / (u @ u)
        b = (rel @ v) / (v @ v)
        inside = (a >= -0.01) & (a <= 1.01) & (b >= -0.01) & (b <= 1.01)
        best = np.where(inside & (dist < best), dist, best)
    return best


def test_deskew_puts_points_back_on_surfaces():
    """A motion-swept scan is geometrically inconsistent if treated as a
    rigid scan-end snapshot; after deskew, points mapped to world by the
    scan-end pose must lie on the world surfaces again."""
    world = sim.World.room(size=20.0, height=5.0, n_boxes=4, seed=1)
    traj = sim.Trajectory.straight(speed=3.0)  # 30 cm of motion per sweep
    t0 = 1.0
    period = 1.0 / SCAN_HZ
    pts_skew, rel_t = sim.simulate_scan_swept(
        world, traj, t0, n_points=2048, noise=0.0, seed=2, scan_period=period)

    ts, gyro, acc = sim.simulate_imu(traj, t0, t0 + period, rate=IMU_HZ)
    T0 = traj.pose(t0)
    v0, _, _ = traj.derivatives(t0)
    nav = ieskf.identity_state()._replace(
        R=jnp.asarray(T0[:3, :3], jnp.float32),
        p=jnp.asarray(T0[:3, 3], jnp.float32),
        v=jnp.asarray(v0, jnp.float32))
    it, ig, ia, im = _pad_imu(ts, gyro, acc, t0)
    nav1, _, log = ieskf.propagate(
        nav, ieskf.init_covariance(), it, ig, ia, im,
        jnp.float32(t0), jnp.float32(t0 + period),
        jnp.array([0.1, 0.1, 1e-4, 1e-4]))

    pj, mask = sim.pad_cloud(pts_skew, 2048)
    body = ieskf.deskew(
        jnp.asarray(pj), jnp.asarray(rel_t), jnp.asarray(mask), log, nav1,
        jnp.float32(t0), jnp.eye(3), jnp.zeros(3))

    T_end = traj.pose(t0 + period)
    ok = np.asarray(mask)
    w_skew = (pts_skew[ok] @ T_end[:3, :3].T) + T_end[:3, 3]
    w_desk = (np.asarray(body)[ok] @ T_end[:3, :3].T) + T_end[:3, 3]
    d_skew = _surface_distance(world, w_skew)
    d_desk = _surface_distance(world, w_desk)
    fin = np.isfinite(d_skew) & np.isfinite(d_desk)
    assert d_desk[fin].mean() < 0.2 * d_skew[fin].mean(), (
        d_skew[fin].mean(), d_desk[fin].mean())
    assert d_desk[fin].mean() < 0.02


@pytest.mark.slow
def test_lio_full_pipeline_low_drift():
    """End-to-end LIO on a simulated room loop: final drift small."""
    world = sim.World.room(size=24.0, height=5.0, n_boxes=8, seed=3)
    traj = sim.Trajectory.loop(radius=7.0, period=40.0)
    period = 1.0 / SCAN_HZ
    n_scans = 60

    cfg = LioConfig(
        blind=0.5, point_filter_num=1, filter_size_surf=0.3,
        filter_size_map=0.3, max_points_per_scan=4096,
        map_table_size=1 << 17, det_range=60.0,
        max_iteration=3,
    )
    lio = LIO(cfg)
    T0 = traj.pose(0.0)
    v0, _, _ = traj.derivatives(0.0)
    state = lio.init_state()
    # world frame := initial body frame; initial velocity in body frame
    state = state._replace(nav=state.nav._replace(
        v=jnp.asarray(T0[:3, :3].T @ v0, jnp.float32)))

    errs = []
    for i in range(n_scans):
        t0 = i * period
        t1 = t0 + period
        pts, rel_t = sim.simulate_scan_swept(
            world, traj, t0, n_points=4096, noise=0.01, seed=10 + i,
            scan_period=period)
        ts, gyro, acc = sim.simulate_imu(
            traj, t0, t1, rate=IMU_HZ, gyro_noise=0.002, acc_noise=0.02,
            seed=20 + i)
        pj, mask = sim.pad_cloud(pts, 4096)
        it, ig, ia, im = _pad_imu(ts, gyro, acc, t0)
        state, res = lio.process_scan(
            state, jnp.asarray(pj), jnp.asarray(rel_t), jnp.asarray(mask),
            it, ig, ia, im, t0, t1)
        # ground truth in the filter's world frame (= body frame at t=0...
        # but scan 0 state is at t1 of scan 0); filter world = body(t=0)
        T_gt = np.linalg.inv(T0) @ traj.pose(t1)
        err = np.linalg.norm(np.asarray(res.pose)[:3, 3] - T_gt[:3, 3])
        errs.append(err)
    errs = np.array(errs)
    # drift over 60 scans (6 s, ~6.6 m traveled) stays small
    assert errs[-1] < 0.15, errs[-5:]
    assert errs.max() < 0.3, errs.max()
