import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import gicp, pgo, se3
from fast_lio_sam_qn_tpu.parallel import mesh as meshlib
from fast_lio_sam_qn_tpu.parallel import spmd
from fast_lio_sam_qn_tpu.utils import sim


def _cloud(n=2048, seed=0):
    world = sim.World.room(size=16.0, height=4.0, n_boxes=5, seed=seed)
    pts = world.sample_points(n, seed=seed, noise=0.005)
    return jnp.asarray(pts), jnp.ones(n, bool)


def test_sharded_gicp_matches_single_device():
    m = meshlib.make_mesh(8)
    src, mask = _cloud(2048, seed=1)
    T_true = se3.se3_exp(jnp.array([0.0, 0.0, 0.1, 0.5, -0.3, 0.05]))
    dst = se3.transform_points(src, T_true)
    src_cov, sok = gicp.plane_covariances(src, mask, backend="brute")
    dst_cov, dok = gicp.plane_covariances(dst, mask, backend="brute")

    T_sh, iters = spmd.sharded_gicp_align(
        m, src, mask & sok, src_cov, dst, mask & dok, dst_cov, jnp.eye(4))
    err = se3.se3_log(se3.pose_between(T_sh, T_true))
    assert float(jnp.linalg.norm(err)) < 0.02, np.asarray(err)

    # parity with the single-device path
    res = gicp.align(src, mask, dst, mask, cov_backend="brute")
    err2 = se3.se3_log(se3.pose_between(T_sh, res.transform))
    assert float(jnp.linalg.norm(err2)) < 0.02


def test_batched_gicp_over_mesh():
    m = meshlib.make_mesh(8)
    b = 8
    srcs, masks, dsts, inits = [], [], [], []
    for i in range(b):
        src, mask = _cloud(1024, seed=10 + i)
        xi = jnp.array([0.0, 0.0, 0.05 * (i % 3), 0.3, 0.1 * i % 2, 0.0])
        dsts.append(se3.transform_points(src, se3.se3_exp(xi)))
        srcs.append(src)
        masks.append(mask)
        inits.append(jnp.eye(4))
    T, fit, conv = spmd.batched_gicp_align(
        m, jnp.stack(srcs), jnp.stack(masks), jnp.stack(dsts),
        jnp.stack(masks), jnp.stack(inits))
    assert T.shape == (b, 4, 4)
    assert np.asarray(conv).all()
    assert np.asarray(fit).max() < 0.05


def test_pgo_sharded_solve_matches_dense():
    m = meshlib.make_mesh(8)
    # build a small noisy chain graph, linearize, compare sharded PCG
    # solution to the single-device optimizer's update direction
    n = 16
    g = pgo.empty_graph(max_nodes=32, max_loops=8)
    rng = np.random.default_rng(0)
    poses_gt = [np.eye(4)]
    for i in range(1, n):
        xi = np.zeros(6)
        xi[3] = 1.0
        poses_gt.append(poses_gt[-1] @ np.asarray(
            se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32))))
    g = pgo.add_first_node(g, jnp.asarray(poses_gt[0], dtype=jnp.float32))
    est = poses_gt[0]
    ests = [est]
    for i in range(1, n):
        rel = np.linalg.inv(poses_gt[i - 1]) @ poses_gt[i]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            rng.normal(0, 0.01, 6), dtype=jnp.float32)))
        est = est @ rel @ noise
        ests.append(est)
        g = pgo.add_odom_node(g, jnp.asarray(ests[i - 1], jnp.float32),
                              jnp.asarray(est, jnp.float32))
    # a ground-truth loop factor makes the graph inconsistent with the
    # drifted odometry (otherwise the residual is trivially zero)
    loop_meas = jnp.asarray(
        np.linalg.inv(poses_gt[n - 1]) @ poses_gt[0], jnp.float32)
    g = pgo.add_loop_factor(g, jnp.int32(n - 1), jnp.int32(0), loop_meas,
                            jnp.float32(1e-3))
    prior_var = jnp.array([1e-4] * 3 + [1e-2] * 3)
    odom_var = jnp.array([1e-4] * 3 + [1e-2] * 3)
    idx_i, idx_j, r, Ji, Jj, w6, valid = pgo._factor_data(
        g, prior_var, odom_var)
    # pad factor arrays to a multiple of 8 for sharding
    f = idx_i.shape[0]
    pad = (-f) % 8
    padz = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
    active = (jnp.arange(g.capacity) < g.num_nodes)[:, None].astype(
        jnp.float32)
    dx = spmd.pgo_optimize_sharded(
        m, g.poses, padz(idx_i), padz(idx_j), padz(r), padz(Ji), padz(Jj),
        padz(w6), padz(valid), active)
    # reference: single-device optimize does one GN step internally; apply
    # our dx and check the graph residual drops
    poses_new = np.asarray(se3.compose(g.poses, se3.se3_exp(dx)))

    def total_residual(poses):
        # weighted: odom factors + the (much stiffer) loop factor
        tot = 0.0
        for i in range(1, n):
            rel = np.linalg.inv(poses[i - 1]) @ poses[i]
            meas = np.asarray(g.odom_meas[i])
            e = np.asarray(se3.se3_log(jnp.asarray(
                np.linalg.inv(meas) @ rel, dtype=jnp.float32)))
            w = np.asarray([1e4] * 3 + [1e2] * 3)
            tot += float(np.sum(e * e * w))
        rel = np.linalg.inv(poses[n - 1]) @ poses[0]
        e = np.asarray(se3.se3_log(jnp.asarray(
            np.linalg.inv(np.asarray(loop_meas)) @ rel, dtype=jnp.float32)))
        tot += float(np.sum(e * e)) * 1e3
        return tot

    before = total_residual(np.asarray(g.poses))
    after = total_residual(poses_new)
    assert after < 0.2 * before, (before, after)


def test_sharded_loop_closure_batch_matches_single():
    """The FULL per-candidate loop-closure program, batch-sharded over the
    8-device mesh, must reproduce the single-device vmapped outputs (the
    product path: FastLioSamQnPipeline(mesh=...) with loop_batch > 0)."""
    from fast_lio_sam_qn_tpu.models import keyframes as kf
    from fast_lio_sam_qn_tpu.models.loop_closure import LoopClosure
    from fast_lio_sam_qn_tpu.utils.config import LoopClosureConfig

    m = meshlib.make_mesh(8)
    cfg = LoopClosureConfig()
    cfg.quatro.fpfh_k_feat = 24
    cfg.quatro.fpfh_k_normal = 20
    lc = LoopClosure(cfg, src_cap=1024, dst_cap=1024)

    world = sim.World.room(size=20.0, height=5.0, n_boxes=8, seed=4)
    store = kf.empty_store(16, 1024)
    rng = np.random.default_rng(0)
    T = np.eye(4, dtype=np.float32)
    for i in range(10):
        T = T.copy()
        T[0, 3] = 1.5 * (i % 5)  # indices 5..9 revisit 0..4
        scan, _ = sim.simulate_scan(world, T, n_points=1024, noise=0.01,
                                    seed=100 + (i % 5))
        cloud, mask = sim.pad_cloud(scan, 1024)
        store = kf.append(store, jnp.asarray(cloud), jnp.asarray(mask),
                          jnp.asarray(T), jnp.asarray(T),
                          jnp.float32(i * 40.0))
    qidx = jnp.asarray(np.array([5, 6, 7, 8, 9, 5, 6, 7], np.int32))
    cidx = jnp.asarray(np.array([0, 1, 2, 3, -1, 0, 1, 2], np.int32))

    ref = lc.perform_loop_closure_batch(store, qidx, cidx)
    shd = lc.perform_loop_closure_batch(store, qidx, cidx, mesh=m)
    np.testing.assert_array_equal(np.asarray(shd.is_valid),
                                  np.asarray(ref.is_valid))
    np.testing.assert_allclose(np.asarray(shd.score),
                               np.asarray(ref.score), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(shd.pose_between),
                               np.asarray(ref.pose_between), atol=1e-3)
    assert int(np.asarray(shd.closest_idx)[4]) == -1


def test_pgo_optimize_full_matches_single_device():
    """spmd.pgo_optimize_full (factor-sharded GN, the product PGO path a
    mesh-equipped pipeline switches to above pgo_shard_min_factors) must
    reproduce ops.pgo.optimize's poses on the same graph."""
    m = meshlib.make_mesh(8)
    n = 16
    g = pgo.empty_graph(max_nodes=32, max_loops=8)
    rng = np.random.default_rng(1)
    poses_gt = [np.eye(4)]
    for i in range(1, n):
        xi = np.zeros(6)
        xi[2] = 0.05
        xi[3] = 1.0
        poses_gt.append(poses_gt[-1] @ np.asarray(
            se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32))))
    g = pgo.add_first_node(g, jnp.asarray(poses_gt[0], dtype=jnp.float32))
    est = poses_gt[0]
    ests = [est]
    for i in range(1, n):
        rel = np.linalg.inv(poses_gt[i - 1]) @ poses_gt[i]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            rng.normal(0, 0.01, 6), dtype=jnp.float32)))
        est = est @ rel @ noise
        ests.append(est)
        g = pgo.add_odom_node(g, jnp.asarray(ests[i - 1], jnp.float32),
                              jnp.asarray(est, jnp.float32))
    loop_meas = jnp.asarray(
        np.linalg.inv(poses_gt[n - 1]) @ poses_gt[0], jnp.float32)
    g = pgo.add_loop_factor(g, jnp.int32(n - 1), jnp.int32(0), loop_meas,
                            jnp.float32(1e-3))
    prior_var = jnp.array([1e-4] * 3 + [1e-2] * 3)
    odom_var = jnp.array([1e-4] * 3 + [1e-2] * 3)

    for robust in (1.0, 0.0):  # Huber on loops, and raw reference weighting
        ref = pgo.optimize(g, prior_var, odom_var, gn_iters=3,
                           pcg_iters=64, robust_delta=robust)
        shd = spmd.pgo_optimize_full(m, g, prior_var, odom_var, gn_iters=3,
                                     pcg_iters=64, robust_delta=robust)
        np.testing.assert_allclose(
            np.asarray(shd.poses[:n]), np.asarray(ref.poses[:n]),
            atol=1e-4,
            err_msg=f"sharded full PGO != single-device (robust={robust})")
