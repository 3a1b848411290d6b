import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import pgo, se3

PRIOR_VAR = jnp.array([1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2])
ODOM_VAR = jnp.array([1e-4, 1e-4, 1e-4, 1e-2, 1e-2, 1e-2])


def _circle_poses(n, radius=10.0):
    """Ground-truth poses around a closed circle."""
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        T = np.asarray(
            se3.make_pose(
                se3.so3_exp(jnp.array([0.0, 0.0, th + np.pi / 2])),
                jnp.array(
                    [radius * np.cos(th) - radius, radius * np.sin(th), 0.0]
                ),
            )
        )
        poses.append(T)
    return np.stack(poses)


def _build_graph(gt, odom_noise=0.0, seed=0, max_loops=8):
    """Graph from dead-reckoned odometry with optional noise."""
    rng = np.random.default_rng(seed)
    n = len(gt)
    g = pgo.empty_graph(max_nodes=128, max_loops=max_loops)
    g = pgo.add_first_node(g, jnp.asarray(gt[0]))
    est = gt[0]
    ests = [est]
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        if odom_noise:
            xi = rng.normal(0, odom_noise, 6) * np.array([1, 1, 1, 5, 5, 1])
            rel = rel @ np.asarray(se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32)))
        est = est @ rel
        ests.append(est)
        g = pgo.add_odom_node(g, jnp.asarray(ests[i - 1]), jnp.asarray(est))
    return g, np.stack(ests)


def test_perfect_odometry_is_fixed_point():
    gt = _circle_poses(32)
    g, _ = _build_graph(gt)
    g2 = pgo.optimize(g, PRIOR_VAR, ODOM_VAR)
    got = np.asarray(g2.poses[:32])
    np.testing.assert_allclose(got, gt, atol=2e-3)


def test_loop_closure_corrects_drift():
    n = 48
    gt = _circle_poses(n)
    g, ests = _build_graph(gt, odom_noise=0.02, seed=1)
    drift_before = np.linalg.norm(ests[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_before > 0.5  # the noise actually produced drift

    # exact loop factor: last node -> node 0 (like the reference's
    # query->closest between factor, fast_lio_sam_qn.cpp:224-233)
    meas = jnp.asarray(np.linalg.inv(gt[n - 1]) @ gt[0], dtype=jnp.float32)
    g = pgo.add_loop_factor(
        g, jnp.int32(n - 1), jnp.int32(0), meas, jnp.float32(0.05)
    )
    g2 = pgo.optimize(g, PRIOR_VAR, ODOM_VAR, gn_iters=6, pcg_iters=128)
    got = np.asarray(g2.poses[:n])
    err_after = np.linalg.norm(got[-1][:3, 3] - gt[-1][:3, 3])
    assert err_after < 0.35 * drift_before, (drift_before, err_after)
    # trajectory-wide improvement
    ate_before = np.sqrt(np.mean(np.sum((ests[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    ate_after = np.sqrt(np.mean(np.sum((got[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    assert ate_after < ate_before


def test_prior_anchors_first_node():
    gt = _circle_poses(16)
    g, _ = _build_graph(gt, odom_noise=0.05, seed=2)
    g2 = pgo.optimize(g, PRIOR_VAR, ODOM_VAR)
    got0 = np.asarray(g2.poses[0])
    np.testing.assert_allclose(got0, gt[0], atol=1e-2)


def test_incremental_usage_warm_start():
    # mimic per-keyframe operation: optimize after every insertion
    gt = _circle_poses(12)
    g = pgo.empty_graph(max_nodes=128, max_loops=8)
    g = pgo.add_first_node(g, jnp.asarray(gt[0]))
    for i in range(1, 12):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        prev = np.asarray(g.poses[i - 1])
        g = pgo.add_odom_node(g, jnp.asarray(prev), jnp.asarray(prev @ rel))
        g = pgo.optimize(g, PRIOR_VAR, ODOM_VAR, gn_iters=2, pcg_iters=32)
    got = np.asarray(g.poses[:12])
    np.testing.assert_allclose(got, gt, atol=5e-3)


def test_capacity_masking():
    # nodes beyond num_nodes stay untouched
    gt = _circle_poses(8)
    g, _ = _build_graph(gt)
    before = np.asarray(g.poses[20])
    g2 = pgo.optimize(g, PRIOR_VAR, ODOM_VAR)
    np.testing.assert_allclose(np.asarray(g2.poses[20]), before, atol=0)
