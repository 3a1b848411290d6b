import os

import numpy as np

from fast_lio_sam_qn_tpu.tools.mulran_convert import convert


def _write_mulran_seq(root, n_scans=4, imu_hz=100):
    """Tiny synthetic sequence in MulRan's native layout: Ouster bins named
    by ns stamp under sensor_data/, xsens_imu.csv, global_pose.csv."""
    os.makedirs(root / "sensor_data" / "Ouster")
    rng = np.random.default_rng(0)
    t0_ns = 1_560_000_000_000_000_000
    for i in range(n_scans):
        stamp = t0_ns + int((i + 1) * 0.1e9)  # scan-END stamps, 10 Hz
        pts = rng.normal(0, 10, (200, 4)).astype(np.float32)
        pts.tofile(str(root / "sensor_data" / "Ouster" / f"{stamp}.bin"))
    n_imu = int(n_scans * imu_hz / 10) + 5
    rows = []
    for i in range(n_imu):
        stamp = t0_ns + int(i * 1e9 / imu_hz)
        # stamp, quat xyzw, euler xyz, gyro xyz, acc xyz, mag xyz
        rows.append([stamp, 0, 0, 0, 1, 0, 0, 0,
                     0.01, 0.02, 0.03, 0.1, 0.2, 9.8, 0, 0, 0])
    np.savetxt(str(root / "sensor_data" / "xsens_imu.csv"),
               np.asarray(rows), delimiter=",", fmt="%.6f")
    gt = []
    for i in range(n_scans):
        stamp = t0_ns + int((i + 1) * 0.1e9)
        T = np.eye(4)
        T[0, 3] = 0.5 * i
        gt.append([stamp] + list(T[:3].ravel()))
    np.savetxt(str(root / "global_pose.csv"), np.asarray(gt),
               delimiter=",", fmt="%.6f")
    return root


def test_convert_layout_and_content(tmp_path):
    seq = _write_mulran_seq(tmp_path / "KAIST03")
    out = tmp_path / "out"
    info = convert(str(seq), str(out))
    assert info["scans"] == 4
    assert info["gt_poses"] == 4
    times = np.loadtxt(out / "times.txt")
    assert len(times) == 4
    np.testing.assert_allclose(np.diff(times), 0.1, atol=1e-6)
    assert (times >= 0).all()
    imu = np.loadtxt(out / "imu.txt")
    np.testing.assert_allclose(imu[0, 1:4], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imu[0, 4:7], [0.1, 0.2, 9.8])
    # imu.txt timestamps share the scan clock (same t0)
    assert imu[0, 0] <= times[0]
    gt = np.loadtxt(out / "gt_poses_kitti.txt")
    assert gt.shape == (4, 12)
    np.testing.assert_allclose(gt[2][3], 1.0)  # x translation of pose 2
    # scans readable via the native loader
    from fast_lio_sam_qn_tpu.runtime import read_scan

    s = read_scan(str(out / "scans" / "000000.bin"))
    assert s.shape == (200, 4)


def test_mulran_preset_runs_end_to_end(tmp_path, capsys):
    """run.py --kitti <converted> --preset mulran drives the full stack on
    a converted MulRan fixture (VERDICT r1 item 4). In-process main() on
    the conftest CPU mesh — the subprocess/FLSQ_PLATFORM path keeps one
    representative in test_rosbag.test_bag_to_run_end_to_end."""
    import json

    from fast_lio_sam_qn_tpu.run import main

    seq = _write_mulran_seq(tmp_path / "KAIST03")
    out = tmp_path / "out"
    convert(str(seq), str(out))
    rc = main(["--kitti", str(out), "--preset", "mulran", "--no-auto-save",
               "--scan-cap", "4096", "--table-size", "131072",
               "--out", str(tmp_path / "res")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["scans"] == 4
