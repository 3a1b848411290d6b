import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import fpfh, gicp, quatro, se3, voxel
from fast_lio_sam_qn_tpu.utils import sim

WORLD = sim.World.room(size=24.0, height=5.0, n_boxes=10, seed=5)


def _pose(xy, yaw):
    T = np.eye(4)
    T[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0.0, 0.0, yaw])))
    T[:3, 3] = [xy[0], xy[1], 1.5]
    return T


def _loop_pair(drift_xi, seed=1):
    """Two scans of the same scene from nearby poses; the src scan is placed
    in the world with a DRIFTED pose (exactly the loop-closure situation:
    clouds are transformed by corrected keyframe poses, loop_closure.cpp:89-92,
    and registration must recover the residual drift)."""
    T1 = _pose((2.0, -1.5), 0.0)
    T2 = _pose((4.0, -3.0), 0.5)
    s1, _ = sim.simulate_scan(WORLD, T1, n_points=16384, noise=0.01, seed=seed)
    s2, _ = sim.simulate_scan(WORLD, T2, n_points=16384, noise=0.01,
                              seed=seed + 1)
    drift = np.asarray(se3.se3_exp(jnp.asarray(drift_xi, dtype=jnp.float32)))
    w1 = s1 @ T1[:3, :3].T + T1[:3, 3]
    w1d = w1 @ drift[:3, :3].T + drift[:3, 3]
    w2 = s2 @ T2[:3, :3].T + T2[:3, 3]
    p1, m1 = sim.pad_cloud(w1d, 16384)
    p2, m2 = sim.pad_cloud(w2, 16384)
    va, vma = voxel.voxel_downsample(jnp.asarray(p1), jnp.asarray(m1), 0.3,
                                     out_cap=8192)
    vb, vmb = voxel.voxel_downsample(jnp.asarray(p2), jnp.asarray(m2), 0.3,
                                     out_cap=8192)
    vp1 = jnp.asarray((drift[:3, :3] @ T1[:3, 3] + drift[:3, 3]).astype(
        np.float32))
    vp2 = jnp.asarray(T2[:3, 3].astype(np.float32))
    return (va, vma, vp1), (vb, vmb, vp2), np.linalg.inv(drift)


def _run_quatro(src, dst):
    (va, vma, vp1), (vb, vmb, vp2) = src, dst
    da, fa = fpfh.fpfh(va, vma, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=vp1)
    db, fb = fpfh.fpfh(vb, vmb, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=vp2)
    fa = fpfh.distinctive(da, fa)
    fb = fpfh.distinctive(db, fb)
    return quatro.align(
        va, da, fa, vb, db, fb,
        noise_bound=jnp.float32(0.3), gnc_factor=jnp.float32(1.4),
        cost_diff_thr=jnp.float32(1e-4), distance_threshold=jnp.float32(35.0),
        max_corres=200, rot_max_iter=50)


def _check(res, T_want, yaw_tol=0.03, t_tol=0.25):
    assert bool(res.converged), (int(res.num_corres), int(res.num_inliers))
    T = np.asarray(res.transform)
    yaw_est = np.arctan2(T[1, 0], T[0, 0])
    yaw_want = np.arctan2(T_want[1, 0], T_want[0, 0])
    assert abs(yaw_est - yaw_want) < yaw_tol, (yaw_est, yaw_want)
    assert np.linalg.norm(T[:3, 3] - T_want[:3, 3]) < t_tol, (
        T[:3, 3], T_want[:3, 3])


def test_fpfh_descriptor_invariance():
    """FPFH must be (approximately) invariant under rigid transforms."""
    a = WORLD.sample_points(2048, seed=3, noise=0.0)
    pa, ma = sim.pad_cloud(a, 2048)
    va, vma = voxel.voxel_downsample(jnp.asarray(pa), jnp.asarray(ma), 0.3,
                                     out_cap=2048)
    T = se3.se3_exp(jnp.array([0.0, 0.0, 0.8, 5.0, 2.0, 0.0]))
    vb = se3.transform_points(va, T)
    vp = jnp.zeros(3)
    da, fa = fpfh.fpfh(va, vma, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=vp)
    db, fb = fpfh.fpfh(vb, vma, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=se3.transform_points(vp[None], T)[0])
    both = np.asarray(fa) & np.asarray(fb)
    d = np.abs(np.asarray(da) - np.asarray(db))[both]
    assert d.mean() < 1.0, d.mean()


def test_distinctive_filters_planes():
    a = WORLD.sample_points(2048, seed=4, noise=0.005)
    pa, ma = sim.pad_cloud(a, 2048)
    va, vma = voxel.voxel_downsample(jnp.asarray(pa), jnp.asarray(ma), 0.3,
                                     out_cap=2048)
    da, fa = fpfh.fpfh(va, vma, jnp.float32(0.9), jnp.float32(1.5),
                       viewpoint=jnp.array([0.0, 0.0, 1.5]))
    keep = fpfh.distinctive(da, fa)
    # filters a substantial fraction (flat walls/floor) but keeps features
    frac = float(jnp.sum(keep)) / max(float(jnp.sum(fa)), 1.0)
    assert 0.05 < frac < 0.9, frac


def test_quatro_recovers_drift():
    src, dst, T_want = _loop_pair([0.0, 0.0, 0.15, 1.5, -1.0, 0.1], seed=1)
    res = _run_quatro(src, dst)
    _check(res, T_want)


def test_quatro_zero_drift():
    src, dst, T_want = _loop_pair([0.0] * 6, seed=3)
    res = _run_quatro(src, dst)
    _check(res, T_want)


def test_quatro_large_yaw_drift():
    src, dst, T_want = _loop_pair([0.0, 0.0, 0.6, 3.0, 2.0, 0.0], seed=5)
    res = _run_quatro(src, dst)
    _check(res, T_want, yaw_tol=0.05, t_tol=0.4)


def test_quatro_then_gicp_fine():
    """The reference's coarseToFineAlignment composition
    (loop_closure.cpp:138-159): quatro coarse -> transform src -> gicp fine,
    final = fine @ coarse."""
    src, dst, T_want = _loop_pair([0.0, 0.0, 0.2, 2.0, -1.5, 0.1], seed=7)
    (va, vma, _), (vb, vmb, _) = src, dst
    res = _run_quatro(src, dst)
    assert bool(res.converged)
    coarse = res.transform
    src_c = se3.transform_points(va, coarse)
    fine = gicp.align(src_c, vma, vb, vmb, cov_backend="brute")
    final = np.asarray(fine.transform) @ np.asarray(coarse)
    err = np.asarray(se3.se3_log(se3.pose_between(
        jnp.asarray(final), jnp.asarray(T_want, dtype=jnp.float32))))
    assert np.linalg.norm(err[:3]) < 0.02, err
    assert np.linalg.norm(err[3:]) < 0.15, err
    # fitness = mean sq NN dist over ALL src points (PCL getFitnessScore
    # semantics): the 2.1 m viewpoint offset here leaves ~partial overlap,
    # whose shadowed regions inflate the score. Pipeline loop closures
    # happen at revisits (high overlap) where the 1.5 gate is meaningful;
    # here we only bound it loosely.
    assert float(fine.fitness) < 3.5


def test_gnc_yaw_sparse_inliers_in_rank_order():
    """~10 clique inliers scattered across 200 correspondence slots must
    still yield usable TIMs (compacted ring pairing): the old roll-by-r
    construction paired SLOT k with slot k-r and produced ~zero TIM pairs
    at this density, degenerating yaw to arctan2(0,0)=0."""
    rng = np.random.default_rng(4)
    c = 200
    yaw_true = 0.35
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)
    t = np.array([1.0, -2.0, 0.2], np.float32)
    s_pts = rng.uniform(-10, 10, (c, 3)).astype(np.float32)
    d_pts = s_pts @ R.T + t
    # inliers: 10 isolated slots, never adjacent (no slot k with k-1/k-2/k-3
    # also inlier, so every rolled pair is masked out under the old scheme)
    inl = np.zeros(c, bool)
    inl[::20] = True
    assert inl.sum() == 10
    # corrupt all non-inlier correspondences
    d_pts[~inl] += rng.uniform(5, 20, (int((~inl).sum()), 3)).astype(
        np.float32) * rng.choice([-1, 1], (int((~inl).sum()), 3))
    yaw, wt, converged = quatro.gnc_rotation_yaw(
        jnp.asarray(s_pts), jnp.asarray(d_pts), jnp.asarray(inl),
        noise_bound=jnp.float32(0.3), gnc_factor=jnp.float32(1.4),
        cost_diff_thr=jnp.float32(1e-4))
    assert bool(converged)
    assert abs(float(yaw) - yaw_true) < 0.01, float(yaw)


def test_advanced_matching_uncapped():
    """use_optimized_matching=False (advanced matching, loop_closure.cpp:22,
    README.md:21): no spatial gate, all mutual matches survive up to the
    static cap — observable as >200 correspondences where the optimized
    mode is hard-capped at 200."""
    rng = np.random.default_rng(0)
    n = 512
    s_pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    yaw_true = 0.3
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    d_pts = s_pts @ R.T + t
    # distinct random descriptors: every point is its own mutual match
    desc = rng.normal(0, 1, (n, 33)).astype(np.float32)
    valid = jnp.ones(n, bool)
    common = dict(noise_bound=jnp.float32(0.3), gnc_factor=jnp.float32(1.4),
                  cost_diff_thr=jnp.float32(1e-4),
                  distance_threshold=jnp.float32(3.0), rot_max_iter=50)
    opt = quatro.align(jnp.asarray(s_pts), jnp.asarray(desc), valid,
                       jnp.asarray(d_pts), jnp.asarray(desc), valid,
                       max_corres=200, optimized_matching=True, **common)
    adv = quatro.align(jnp.asarray(s_pts), jnp.asarray(desc), valid,
                       jnp.asarray(d_pts), jnp.asarray(desc), valid,
                       max_corres=1024, optimized_matching=False, **common)
    # optimized: the |s - d| = ~2.3-25 m offsets exceed the 3 m spatial
    # gate for most pairs AND the survivor count is capped at 200
    assert int(opt.num_corres) <= 200
    # advanced: every mutual match survives (no gate, cap is exhaustive)
    assert int(adv.num_corres) == n, int(adv.num_corres)
    assert bool(adv.converged)
    T = np.asarray(adv.transform)
    assert abs(np.arctan2(T[1, 0], T[0, 0]) - yaw_true) < 0.02
    assert np.linalg.norm(T[:3, 3] - t) < 0.15


def test_estimating_scale():
    """estimating_scale=True (loop_closure.cpp:24): recover the similarity
    (sR, t) — TEASER-style TLS scale from TIM norm ratios, estimated before
    the (de-scaled) clique."""
    rng = np.random.default_rng(1)
    n = 256
    s_pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    scale_true = 1.15
    yaw_true = 0.25
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)
    t = np.array([0.5, 1.5, -0.3], np.float32)
    d_pts = (scale_true * (s_pts @ R.T) + t).astype(np.float32)
    # 20% outlier correspondences
    n_out = n // 5
    d_pts[:n_out] = rng.uniform(-8, 8, (n_out, 3)).astype(np.float32)
    desc = rng.normal(0, 1, (n, 33)).astype(np.float32)
    valid = jnp.ones(n, bool)
    res = quatro.align(jnp.asarray(s_pts), jnp.asarray(desc), valid,
                       jnp.asarray(d_pts), jnp.asarray(desc), valid,
                       noise_bound=jnp.float32(0.3),
                       gnc_factor=jnp.float32(1.4),
                       cost_diff_thr=jnp.float32(1e-4),
                       distance_threshold=jnp.float32(100.0),
                       max_corres=256, rot_max_iter=50,
                       estimate_scale=True)
    assert bool(res.converged)
    assert abs(float(res.scale) - scale_true) < 0.03, float(res.scale)
    T = np.asarray(res.transform)
    # transform carries s*R: det of the linear block is s^3
    assert abs(np.linalg.det(T[:3, :3]) ** (1 / 3) - scale_true) < 0.03
    assert abs(np.arctan2(T[1, 0], T[0, 0]) - yaw_true) < 0.03
    assert np.linalg.norm(T[:3, 3] - t) < 0.25
    # the flag off on the same data: scale stays exactly 1
    res0 = quatro.align(jnp.asarray(s_pts), jnp.asarray(desc), valid,
                        jnp.asarray(d_pts), jnp.asarray(desc), valid,
                        noise_bound=jnp.float32(0.3),
                        gnc_factor=jnp.float32(1.4),
                        cost_diff_thr=jnp.float32(1e-4),
                        distance_threshold=jnp.float32(100.0),
                        max_corres=256, rot_max_iter=50)
    assert float(res0.scale) == 1.0


def test_estimate_scale_degenerate_clamped():
    """A degenerate consensus window (near-coincident dst points -> tiny TIM
    norms -> ratios near 0 with wide alpha windows) must yield a finite,
    clamped scale: dividing a ~0 scale out of the transform downstream would
    emit inf/NaN without tripping converged (advisor r4)."""
    rng = np.random.default_rng(3)
    n = 64
    s_pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    # dst collapsed to a ~1 mm blob: every ratio |w|/|v| ~ 0 while the
    # per-candidate alpha windows (2*nb/|v|) stay wide enough to agree
    d_pts = (1e-3 * rng.standard_normal((n, 3))).astype(np.float32)
    scale, votes = quatro.estimate_scale_tims(
        jnp.asarray(s_pts), jnp.asarray(d_pts), jnp.ones(n, bool),
        jnp.float32(0.3))
    s = float(scale)
    assert np.isfinite(s)
    assert 0.05 <= s <= 20.0, s


def test_max_clique_greedy_cap_path():
    """C > greedy_cap takes the gathered top-K submatrix greedy
    (ops/quatro.py max_clique_inliers): a 60-vertex clique scattered over
    1024 slots (with invalid padding and gross outliers) must be recovered
    identically to the full-length greedy — replicator support ranks the
    clique into the top-K, so the cap discards only near-zero-support
    vertices."""
    rng = np.random.default_rng(7)
    c = 1024
    yaw_true = -0.4
    cy, sy = np.cos(yaw_true), np.sin(yaw_true)
    R = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]],
                 np.float32)
    t = np.array([-2.0, 3.0, 0.1], np.float32)
    s_pts = rng.uniform(-12, 12, (c, 3)).astype(np.float32)
    d_pts = (s_pts @ R.T + t).astype(np.float32)
    inl_true = np.zeros(c, bool)
    inl_true[rng.choice(c, 60, replace=False)] = True
    out = ~inl_true
    d_pts[out] += (rng.uniform(4, 25, (int(out.sum()), 3))
                   * rng.choice([-1.0, 1.0], (int(out.sum()), 3))).astype(
        np.float32)
    valid = np.ones(c, bool)
    valid[rng.choice(np.where(out)[0], 200, replace=False)] = False

    kept_cap = np.asarray(quatro.max_clique_inliers(
        jnp.asarray(s_pts), jnp.asarray(d_pts), jnp.asarray(valid),
        jnp.float32(0.3)))
    kept_full = np.asarray(quatro.max_clique_inliers(
        jnp.asarray(s_pts), jnp.asarray(d_pts), jnp.asarray(valid),
        jnp.float32(0.3), greedy_cap=c))
    # all true inliers recovered, no gross outliers admitted
    assert (kept_cap & inl_true).sum() == 60, (kept_cap & inl_true).sum()
    assert not (kept_cap & ~valid).any()
    assert (kept_cap & out).sum() <= 2, (kept_cap & out).sum()
    assert (kept_cap == kept_full).all()
