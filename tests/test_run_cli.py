"""End-to-end tests of the runner CLI (the roslaunch equivalent)."""
import json
import os

import numpy as np
import pytest

from fast_lio_sam_qn_tpu.utils import sim


@pytest.fixture(scope="module")
def kitti_style_dir(tmp_path_factory):
    """Tiny KITTI-style dataset from the simulator: scans/*.bin (xyzi f32),
    times.txt, imu.txt."""
    d = tmp_path_factory.mktemp("kitti")
    os.makedirs(d / "scans")
    world = sim.World.room(size=20.0, height=5.0, n_boxes=6, seed=2)
    traj = sim.Trajectory.straight(speed=1.0)
    period = 0.1
    n = 30
    times = []
    imu_rows = []
    # pre-motion standstill samples for gravity init
    for t in np.arange(-0.2, 0.0, 0.005):
        T = traj.pose(0.0)
        g = np.array([0.0, 0.0, 9.81])
        imu_rows.append([t, 0, 0, 0, *(T[:3, :3].T @ g)])
    for i in range(n):
        t0 = i * period
        pts, rel_t = sim.simulate_scan_swept(
            world, traj, t0, n_points=2048, noise=0.01, seed=50 + i,
            scan_period=period)
        ok = np.isfinite(pts).all(-1)
        xyzi = np.concatenate(
            [pts[ok], np.zeros((ok.sum(), 1), np.float32)], -1)
        xyzi.astype(np.float32).tofile(str(d / "scans" / f"{i:06d}.bin"))
        times.append(t0 + period)
        ts, gyro, acc = sim.simulate_imu(traj, t0, t0 + period, rate=100.0)
        for t, g_, a_ in zip(ts, gyro, acc):
            imu_rows.append([t, *g_, *a_])
    np.savetxt(str(d / "times.txt"), np.asarray(times))
    np.savetxt(str(d / "imu.txt"), np.asarray(imu_rows))
    return str(d), traj


def test_run_kitti_mode(kitti_style_dir, tmp_path, capsys):
    from fast_lio_sam_qn_tpu.run import main

    d, traj = kitti_style_dir
    rc = main(["--kitti", d, "--preset", "sim", "--out", str(tmp_path)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["mode"] == "kitti"
    assert report["keyframes"] >= 1
    assert os.path.exists(os.path.join(report["exported_to"],
                                       "poses_kitti.txt"))
    # trajectory sanity: straight line ~1 m/s for 1.5 s
    from fast_lio_sam_qn_tpu.utils import io
    poses = io.load_poses_kitti(
        os.path.join(report["exported_to"], "poses_kitti.txt"))
    assert poses[-1][0, 3] > 0.4  # moved forward in +x


def test_run_parity_mode(kitti_style_dir, tmp_path, capsys):
    from fast_lio_sam_qn_tpu.run import main

    d, traj = kitti_style_dir
    # odometry file: ground-truth poses (body frame scans unchanged)
    period = 0.1
    poses = np.stack([traj.pose((i + 1) * period) for i in range(30)])
    pose_file = str(tmp_path / "odom.txt")
    from fast_lio_sam_qn_tpu.utils.io import save_poses_kitti
    save_poses_kitti(pose_file, poses)
    rc = main(["--scans", os.path.join(d, "scans"), "--poses", pose_file,
               "--preset", "sim", "--out", str(tmp_path / "out")])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["mode"] == "parity"
    assert report["keyframes"] >= 1


def test_run_requires_mode():
    from fast_lio_sam_qn_tpu.run import main

    with pytest.raises(SystemExit):
        main(["--out", "/tmp/x"])
