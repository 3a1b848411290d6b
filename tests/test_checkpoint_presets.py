import numpy as np
import pytest

from fast_lio_sam_qn_tpu.configs.presets import LIO_PRESETS, get_pipeline_config
from fast_lio_sam_qn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from fast_lio_sam_qn_tpu.utils.profiling import Profiler


def test_presets_effective_values():
    cfg = get_pipeline_config("kitti")
    assert cfg.lio.extrinsic_T == (0.81, -0.32, 0.8)  # kitti.yaml:23
    assert cfg.lio.point_filter_num == 4              # kitti.launch:7
    assert cfg.lio.filter_size_surf == 0.5            # kitti.launch:9
    # shared PGO values ride along (reference effective values)
    assert cfg.loop.num_submap_keyframes == 5
    assert cfg.loop.quatro.max_num_corres == 200
    m = get_pipeline_config("mulran")
    assert m.lio.point_filter_num == 3                # mulran.launch
    assert m.lio.det_range == 150.0
    with pytest.raises(KeyError):
        get_pipeline_config("nope")
    assert set(LIO_PRESETS) >= {
        "kitti", "mulran", "newer-college2020", "kimera-multi",
        "vbr-colosseo", "ouster", "velodyne", "livox"}


def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import _run_loop_trajectory, small_config

    pipe, gt = _run_loop_trajectory(small_config(), n_scans=40, seed=3)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(pipe, path)

    from fast_lio_sam_qn_tpu.models.pipeline import FastLioSamQnPipeline

    pipe2 = FastLioSamQnPipeline(small_config())
    load_checkpoint(pipe2, path)
    assert pipe2.current_kf_idx == pipe.current_kf_idx
    np.testing.assert_allclose(
        pipe2.get_corrected_keyframe_poses(),
        pipe.get_corrected_keyframe_poses(), atol=1e-6)
    assert pipe2.kf_timestamps == pipe.kf_timestamps
    # resumed pipeline keeps working: feed more frames
    import jax.numpy as jnp
    from fast_lio_sam_qn_tpu.utils import sim
    world = sim.World.room(size=26.0, height=5.0, n_boxes=10, seed=3)
    traj = sim.Trajectory.loop(radius=7.0, period=40.0)
    t = 40 * 0.2
    scan, _ = sim.simulate_scan(world, traj.pose(t), n_points=4096, seed=999)
    cloud, mask = sim.pad_cloud(scan, 4096)
    before = pipe2.current_kf_idx
    for j in range(12):
        # move forward enough to trigger a keyframe
        T = traj.pose(t + j * 0.4)
        pipe2.feed(jnp.asarray(T, jnp.float32), jnp.asarray(cloud),
                   jnp.asarray(mask), t + j * 0.4)
    assert pipe2.current_kf_idx > before


def test_profiler():
    import time

    prof = Profiler()
    with prof.span("a"):
        time.sleep(0.01)
    with prof.span("a"):
        time.sleep(0.02)
    s = prof.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["avg_ms"] > 5
    assert "a:" in prof.report_line()


def test_lio_map_export_and_archive_roundtrip(tmp_path):
    import jax.numpy as jnp
    from fast_lio_sam_qn_tpu.models.lio import LIO
    from fast_lio_sam_qn_tpu.ops import hashgrid
    from fast_lio_sam_qn_tpu.utils import io, sim
    from fast_lio_sam_qn_tpu.utils.config import LioConfig

    from fast_lio_sam_qn_tpu.ops import surfel_map

    pts = jnp.asarray(sim.World.room(seed=0).sample_points(500, seed=1))
    # both map backends export points
    lio_s = LIO(LioConfig(map_table_size=1 << 12, map_backend="surfel"))
    st_s = lio_s.init_state()
    st_s = st_s._replace(grid=surfel_map.insert(
        st_s.grid, pts, jnp.ones(500, bool), jnp.float32(0.1)))
    m = LIO.get_map_points(st_s)
    assert len(m) > 100 and m.shape[1] == 3
    lio_p = LIO(LioConfig(map_table_size=1 << 12, map_backend="point"))
    st_p = lio_p.init_state()
    st_p = st_p._replace(grid=hashgrid.insert(
        st_p.grid, pts, jnp.ones(500, bool)))
    m = LIO.get_map_points(st_p)
    assert len(m) > 100 and m.shape[1] == 3

    # keyframe archive round-trip
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import _run_loop_trajectory, small_config
    pipe, gt = _run_loop_trajectory(small_config(), n_scans=30, seed=5)
    out = io.save_results(pipe, str(tmp_path))
    import os
    clouds, poses, ts = io.load_keyframe_archive(
        os.path.join(out, "result_keyframes.npz"))
    assert len(clouds) == pipe.current_kf_idx
    np.testing.assert_allclose(
        poses, pipe.get_corrected_keyframe_poses(), atol=1e-6)


def test_keyframe_capacity_grows():
    """Overflow re-pads (doubles) the device store instead of raising —
    SURVEY §5's amortized growth (VERDICT r1 item 6)."""
    import jax.numpy as jnp
    from fast_lio_sam_qn_tpu.models.pipeline import FastLioSamQnPipeline
    from fast_lio_sam_qn_tpu.utils.config import Capacities, PipelineConfig

    cfg = PipelineConfig()
    cfg.caps = Capacities(max_keyframes=2, max_loop_factors=2,
                          keyframe_points=128, src_points=128,
                          dst_points=128)
    pipe = FastLioSamQnPipeline(cfg)
    cloud = jnp.zeros((128, 3))
    mask = jnp.ones(128, bool)
    import numpy as np
    T = np.eye(4)
    pipe.feed(T, cloud, mask, 0.0)
    T2 = np.eye(4); T2[0, 3] = 5.0
    pipe.feed(T2, cloud, mask, 0.1)
    T3 = np.eye(4); T3[0, 3] = 10.0
    pipe.feed(T3, cloud, mask, 0.2)
    assert pipe.current_kf_idx == 3
    assert pipe.store.capacity == 4
    assert pipe.graph.poses.shape[0] == 4


def test_plot_results(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import _run_loop_trajectory, small_config
    from fast_lio_sam_qn_tpu.utils.viz import plot_results

    pipe, gt = _run_loop_trajectory(small_config(), n_scans=30, seed=6)
    out = plot_results(pipe, str(tmp_path / "traj.png"))
    import os
    assert os.path.getsize(out) > 10_000  # a real image
