"""Unit tests for loop-closure candidate gating and submap construction,
mirroring the reference's exact semantics (loop_closure.cpp:34-108)."""
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.models import keyframes as kf
from fast_lio_sam_qn_tpu.models.loop_closure import (
    fetch_closest_keyframe_idx,
    set_src_and_dst_cloud,
)
from fast_lio_sam_qn_tpu.ops import se3


def _store_with_poses(positions, times, n_pts=64):
    st = kf.empty_store(32, n_pts)
    rng = np.random.default_rng(0)
    for i, (p, t) in enumerate(zip(positions, times)):
        T = se3.make_pose(jnp.eye(3), jnp.asarray(p, jnp.float32))
        # frame i's cloud sits at z = 100*i so frames are cleanly separable
        cloud = rng.normal(0, 1, (n_pts, 3)).astype(np.float32)
        cloud[:, 2] += 100.0 * i
        st = kf.append(st, jnp.asarray(cloud), jnp.ones(n_pts, bool), T, T,
                       jnp.float32(t))
    return st


def test_fetch_respects_radius_and_timediff():
    # query at origin, t=100; candidates at varying distance/age
    positions = [
        (1.0, 0, 0),     # close, old -> candidate
        (40.0, 0, 0),    # too far (radius 35)
        (2.0, 0, 0),     # close but too recent (timediff 30)
        (5.0, 0, 0),     # close, old -> candidate but farther than #0
        (0.0, 0, 0),     # the query itself (latest, excluded by idx bound)
    ]
    times = [10.0, 10.0, 90.0, 20.0, 100.0]
    st = _store_with_poses(positions, times)
    q_pose = st.poses_corrected[4]
    idx = fetch_closest_keyframe_idx(
        st, q_pose, st.timestamps[4], jnp.float32(35.0), jnp.float32(30.0))
    assert int(idx) == 0


def test_fetch_returns_minus_one_when_gated():
    positions = [(100.0, 0, 0), (0.0, 0, 0)]
    times = [10.0, 100.0]
    st = _store_with_poses(positions, times)
    idx = fetch_closest_keyframe_idx(
        st, st.poses_corrected[1], st.timestamps[1],
        jnp.float32(35.0), jnp.float32(30.0))
    assert int(idx) == -1


def test_fetch_excludes_last_keyframe():
    """The reference iterates idx < size-1 (loop_closure.cpp:41): the latest
    keyframe can never be its own candidate even if in range."""
    positions = [(0.1, 0, 0), (0.0, 0, 0)]
    times = [10.0, 100.0]
    st = _store_with_poses(positions, times)
    idx = fetch_closest_keyframe_idx(
        st, st.poses_corrected[1], st.timestamps[1],
        jnp.float32(35.0), jnp.float32(30.0))
    # keyframe 0 is close and old -> picked; the query (1) excluded
    assert int(idx) == 0


def test_submap_bounds_mirror_reference():
    """Submap accumulation covers [idx-R, idx+R] clipped to [0, count-1)
    — the reference's i < size-1 bound (loop_closure.cpp:74) excludes the
    newest keyframe from any submap."""
    positions = [(float(i), 0, 0) for i in range(6)]
    times = [float(i) for i in range(6)]
    st = _store_with_poses(positions, times, n_pts=32)
    # dst submap around idx 4 with range 2: frames 2,3,4 (5 excluded)
    (src, sm), (dst, dm) = set_src_and_dst_cloud(
        st, jnp.int32(5), jnp.int32(4), submap_range=2, src_cap=512,
        dst_cap=512, voxel_res=0.01, enable_quatro=False,
        enable_submap_matching=False)
    d = np.asarray(dst)[np.asarray(dm)]
    levels = set(np.round(d[:, 2] / 100.0).astype(int))
    assert levels == {2, 3, 4}, levels  # 5 (newest) excluded, 0-1 out of range
    # src in scan mode = the query frame itself (idx 5 allowed there)
    s = np.asarray(src)[np.asarray(sm)]
    s_levels = set(np.round(s[:, 2] / 100.0).astype(int))
    assert s_levels == {5}, s_levels


def test_matching_mode_flag_changes_behavior():
    """QuatroConfig.use_optimized_matching must be CONSUMED: flipping it to
    False (advanced matching, loop_closure.cpp:22) switches the matcher to
    the ungated/uncapped path — observable as more correspondences than
    the optimized mode's max_num_corres cap admits."""
    import dataclasses

    from fast_lio_sam_qn_tpu.models.loop_closure import LoopClosure
    from fast_lio_sam_qn_tpu.utils.config import LoopClosureConfig
    from fast_lio_sam_qn_tpu.utils import sim

    world = sim.World.room(size=16.0, height=4.0, n_boxes=6, seed=2)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = [1.0, 0.5, 1.5]
    s1, _ = sim.simulate_scan(world, T1, n_points=512, noise=0.01, seed=1)
    s2, _ = sim.simulate_scan(world, T1, n_points=512, noise=0.01, seed=2)
    w1 = s1 @ T1[:3, :3].T + T1[:3, 3]
    w2 = s2 @ T1[:3, :3].T + T1[:3, 3]
    c1, m1 = sim.pad_cloud(w1.astype(np.float32), 512)
    c2, m2 = sim.pad_cloud(w2.astype(np.float32), 512)
    vp = jnp.asarray(T1[:3, 3])

    def run(optimized: bool):
        cfg = LoopClosureConfig()
        cfg.quatro = dataclasses.replace(
            cfg.quatro, use_optimized_matching=optimized,
            max_num_corres=8,          # tiny cap: starves the optimized mode
            advanced_max_corres=256, fpfh_k_feat=16, fpfh_k_normal=12)
        lc = LoopClosure(cfg, src_cap=512, dst_cap=512)
        _, _, valid, q = lc.coarse_to_fine_alignment(
            jnp.asarray(c1), jnp.asarray(m1), jnp.asarray(c2),
            jnp.asarray(m2), vp, vp)
        return int(q.num_corres), bool(valid)

    n_opt, _ = run(True)
    n_adv, valid_adv = run(False)
    assert n_opt <= 8
    assert n_adv > n_opt, (n_adv, n_opt)
    assert valid_adv
