import os

import numpy as np

from fast_lio_sam_qn_tpu.tools.kitti_convert import _parse_timestamps, convert


def _write_kitti_drive(root, n_scans=5, imu_hz=10):
    os.makedirs(root / "velodyne_points" / "data")
    os.makedirs(root / "oxts" / "data")
    rng = np.random.default_rng(0)
    with open(root / "velodyne_points" / "timestamps.txt", "w") as f:
        for i in range(n_scans):
            sec = 30.0 + i * 0.1
            f.write(f"2011-09-26 13:02:{sec:012.9f}\n")
    for i in range(n_scans):
        pts = rng.normal(0, 10, (100, 4)).astype(np.float32)
        pts.tofile(str(root / "velodyne_points" / "data" / f"{i:010d}.bin"))
    n_imu = n_scans * imu_hz // 10 + 2
    with open(root / "oxts" / "timestamps.txt", "w") as f:
        for i in range(n_imu):
            sec = 30.0 + i * (1.0 / imu_hz)
            f.write(f"2011-09-26 13:02:{sec:012.9f}\n")
    for i in range(n_imu):
        row = np.zeros(30)
        row[11:14] = [0.1, 0.2, 9.8]   # ax ay az
        row[17:20] = [0.01, 0.02, 0.03]  # wx wy wz
        np.savetxt(str(root / "oxts" / "data" / f"{i:010d}.txt"), row[None])
    return root


def test_parse_timestamps(tmp_path):
    p = tmp_path / "ts.txt"
    p.write_text("2011-09-26 13:02:30.500000000\n"
                 "2011-09-26 13:02:30.600000000\n")
    t = _parse_timestamps(str(p))
    np.testing.assert_allclose(np.diff(t), [0.1], atol=1e-9)


def test_convert_layout_and_content(tmp_path):
    drive = _write_kitti_drive(tmp_path / "drive")
    out = tmp_path / "out"
    info = convert(str(drive), str(out))
    assert info["scans"] == 5
    times = np.loadtxt(out / "times.txt")
    assert len(times) == 5
    np.testing.assert_allclose(np.diff(times), 0.1, atol=1e-6)
    assert times[0] >= 0.0
    imu = np.loadtxt(out / "imu.txt")
    # gyro cols = wx wy wz, acc cols = ax ay az
    np.testing.assert_allclose(imu[0, 1:4], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imu[0, 4:7], [0.1, 0.2, 9.8])
    # scans readable via the native loader
    from fast_lio_sam_qn_tpu.runtime import read_scan

    s = read_scan(str(out / "scans" / "000000.pcd").replace(".pcd", ".bin"))
    assert s.shape == (100, 4)
