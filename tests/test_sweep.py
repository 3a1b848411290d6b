"""utils/sweep.py — per-point sweep-time synthesis and the true-time
deskew path (round-2 verdict Missing #2/#3)."""
import json
import os

import numpy as np
import pytest

from fast_lio_sam_qn_tpu.utils import sim, sweep


def test_synthesize_velodyne_azimuth_quantized():
    # sweep convention: starts at -x azimuth, clockwise (the FAST-LIO yaw
    # synthesis this mirrors): -x -> 0, +y -> 1/4, +x -> 1/2, -y -> 3/4
    pts = np.array([[10.0, 0.0, 0.0],
                    [0.0, -10.0, 0.0],
                    [-10.0, 0.0, 0.0],
                    [0.0, 10.0, 0.0]] * 16, np.float32)
    rel = sweep.synthesize_rel_times(pts, 0.1, "velodyne", scan_line=16)
    # 64 points / 16 rings -> 4 firing columns; quantized to column starts
    np.testing.assert_allclose(rel[:4], [0.05, 0.075, 0.0, 0.025],
                               atol=1e-6)
    assert rel.dtype == np.float32
    # scan_line consumes: coarser ring count -> coarser quantization
    rel2 = sweep.synthesize_rel_times(pts, 0.1, "velodyne", scan_line=32)
    assert len(np.unique(rel2)) <= 2


def test_synthesize_livox_index_ramp():
    pts = np.random.default_rng(0).normal(0, 5, (100, 3)).astype(np.float32)
    rel = sweep.synthesize_rel_times(pts, 0.1, "livox")
    np.testing.assert_allclose(rel, np.arange(100) / 100 * 0.1, atol=1e-6)
    # index ramp is azimuth-independent
    assert rel[1] > rel[0]


def test_synthesize_degenerate():
    assert len(sweep.synthesize_rel_times(np.zeros((0, 3)), 0.1)) == 0
    np.testing.assert_array_equal(
        sweep.synthesize_rel_times(np.ones((5, 3)), 0.0), np.zeros(5))


def test_load_rel_times_sidecar(tmp_path):
    os.makedirs(tmp_path / "rel_times")
    rel = np.linspace(0, 0.1, 30).astype(np.float32)
    np.save(tmp_path / "rel_times" / "000002.npy", rel)
    assert sweep.load_rel_times(str(tmp_path), 0, 30) is None
    out = sweep.load_rel_times(str(tmp_path), 2, 30)
    np.testing.assert_allclose(out, rel)
    # pads short files, truncates long reads to the requested count
    assert len(sweep.load_rel_times(str(tmp_path), 2, 40)) == 40
    assert len(sweep.load_rel_times(str(tmp_path), 2, 10)) == 10


def _livox_style_dataset(d, with_true_times: bool, n_scans=20,
                         chunks=4, pts_per_chunk=512):
    """Scans whose acquisition order is NOT the azimuth sweep: each scan is
    `chunks` time-blocks, each a full-azimuth snapshot from the pose at the
    block's time (a solid-state/livox-like pattern). Azimuth synthesis
    assigns these points wrong times; the true block times deskew
    correctly."""
    os.makedirs(os.path.join(d, "scans"))
    if with_true_times:
        os.makedirs(os.path.join(d, "rel_times"))
    world = sim.World.room(size=20.0, height=5.0, n_boxes=6, seed=2)
    # 3 m/s: 0.3 m of motion per sweep — wrong per-point times displace
    # points by up to the full inter-chunk error, well above the noise
    traj = sim.Trajectory.straight(speed=3.0)
    period = 0.1
    times = []
    imu_rows = []
    for t in np.arange(-0.2, 0.0, 0.005):
        T = traj.pose(0.0)
        g = np.array([0.0, 0.0, 9.81])
        imu_rows.append([t, 0, 0, 0, *(T[:3, :3].T @ g)])
    for i in range(n_scans):
        t0 = i * period
        pts_all, rel_all = [], []
        for j in range(chunks):
            tj = t0 + (j + 0.5) / chunks * period
            # yaw-offset each block so the chunks interleave azimuth
            # columns instead of resampling the same fixed directions
            phi = (j / chunks) * (2 * np.pi / max(pts_per_chunk // 32, 1))
            Rz = np.array([[np.cos(phi), -np.sin(phi), 0],
                           [np.sin(phi), np.cos(phi), 0],
                           [0, 0, 1.0]])
            Tj = traj.pose(tj).copy()
            Tj[:3, :3] = Tj[:3, :3] @ Rz
            pts, _ = sim.simulate_scan(world, Tj,
                                       n_points=pts_per_chunk, noise=0.005,
                                       seed=1000 + i * chunks + j)
            ok = np.isfinite(pts).all(-1)
            pts_all.append(pts[ok] @ Rz.T)  # back to the unrotated frame
            rel_all.append(np.full(ok.sum(), tj - t0, np.float32))
        pts = np.concatenate(pts_all)
        rel = np.concatenate(rel_all)
        xyzi = np.concatenate([pts, np.zeros((len(pts), 1))], -1)
        xyzi.astype(np.float32).tofile(
            os.path.join(d, "scans", f"{i:06d}.bin"))
        if with_true_times:
            np.save(os.path.join(d, "rel_times", f"{i:06d}.npy"), rel)
        times.append(t0 + period)
        ts, gyro, acc = sim.simulate_imu(traj, t0, t0 + period, rate=100.0)
        for t, g_, a_ in zip(ts, gyro, acc):
            imu_rows.append([t, *g_, *a_])
    np.savetxt(os.path.join(d, "times.txt"), np.asarray(times))
    np.savetxt(os.path.join(d, "imu.txt"), np.asarray(imu_rows))
    return traj


def _run_and_ate(d, traj, out):
    from fast_lio_sam_qn_tpu.run import main

    rc = main(["--kitti", d, "--preset", "sim", "--out", out])
    assert rc == 0
    tum = np.loadtxt(os.path.join(out, "sequence", "poses_tum.txt"),
                     skiprows=1, ndmin=2)
    T0inv = np.linalg.inv(traj.pose(0.0))  # LIO frame = body frame at t=0
    err = []
    for row in tum:
        gt = (T0inv @ traj.pose(row[0]))[:3, 3]
        err.append(np.sum((row[1:4] - gt) ** 2))
    return float(np.sqrt(np.mean(err)))


@pytest.mark.slow
def test_true_time_deskew_beats_azimuth_synthesis(tmp_path, capsys):
    """On a non-azimuth-swept (livox-pattern) sequence, consuming true
    per-point times (rel_times sidecar) must beat the spinning-lidar
    azimuth synthesis measurably — the round-2 verdict's done-condition
    for carrying timestamps through the bag path."""
    from conftest import deterministic_cache

    def build():
        da = str(tmp_path / "true_t")
        db = str(tmp_path / "synth")
        traj = _livox_style_dataset(da, with_true_times=True)
        _livox_style_dataset(db, with_true_times=False)
        a = _run_and_ate(da, traj, str(tmp_path / "oa"))
        capsys.readouterr()
        b = _run_and_ate(db, traj, str(tmp_path / "ob"))
        capsys.readouterr()
        return a, b

    # both e2e runs are deterministic functions of the package source +
    # this module (dataset generator): cache across unchanged-code runs
    ate_true, ate_synth = deterministic_cache(
        "sweep_deskew_ates", ("livox20x4x512",), build,
        extra_files=(__file__,))
    print(json.dumps({"ate_true": ate_true, "ate_synth": ate_synth}))
    # measured on the 8-dev CPU mesh: 0.30 m (true) vs 1.24 m (synth)
    assert ate_true < ate_synth, (ate_true, ate_synth)
    assert ate_synth - ate_true > 0.3 * ate_synth, (ate_true, ate_synth)
