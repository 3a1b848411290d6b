import jax
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import gicp, linalg3, se3
from fast_lio_sam_qn_tpu.utils import sim


def _room_cloud(n=2048, seed=0, noise=0.01):
    world = sim.World.room(size=16.0, height=4.0, n_boxes=5, seed=seed)
    pts = world.sample_points(n, seed=seed, noise=noise)
    return jnp.asarray(pts), jnp.ones(n, bool)


def test_eigh3_matches_numpy():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (128, 3, 3))
    A = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(3)
    vals, vecs = linalg3.eigh3(A)
    w_np = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(np.asarray(vals), w_np, rtol=1e-4, atol=1e-4)
    # eigvec property: A v = lambda v
    Av = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(vecs))
    lv = np.asarray(vals)[:, None, :] * np.asarray(vecs)
    np.testing.assert_allclose(Av, lv, atol=1e-3)


def test_inv3():
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (64, 3, 3)) + 3.0 * jnp.eye(3)
    Ainv = linalg3.inv3(A)
    eye = np.einsum("nij,njk->nik", np.asarray(A), np.asarray(Ainv))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-4)


def test_plane_covariances_flat_plane():
    # points on z=0 plane: regularized covariance must be thin in z
    key = jax.random.PRNGKey(2)
    xy = jax.random.uniform(key, (512, 2), minval=-5, maxval=5)
    pts = jnp.concatenate([xy, jnp.zeros((512, 1))], axis=-1)
    mask = jnp.ones(512, bool)
    covs, valid = gicp.plane_covariances(pts, mask, k=15, backend="brute")
    assert np.asarray(valid).all()
    c = np.asarray(covs)
    # normal direction (z) variance == PLANE_EPS, in-plane == 1
    np.testing.assert_allclose(c[:, 2, 2], gicp.PLANE_EPS, atol=1e-4)
    np.testing.assert_allclose(c[:, 0, 0] + c[:, 1, 1], 2.0, atol=1e-3)


def test_gicp_identity():
    src, mask = _room_cloud(1024, seed=3)
    res = gicp.align(src, mask, src, mask, cov_backend="brute")
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-3)
    assert float(res.fitness) < 1e-4
    assert bool(res.converged)


def test_gicp_recovers_known_transform():
    src, mask = _room_cloud(2048, seed=4, noise=0.005)
    true_xi = jnp.array([0.02, -0.03, 0.05, 0.4, -0.3, 0.1])
    T_true = se3.se3_exp(true_xi)
    dst = se3.transform_points(src, T_true)
    res = gicp.align(src, mask, dst, mask, cov_backend="brute")
    err = se3.se3_log(se3.pose_between(res.transform, T_true))
    assert float(jnp.linalg.norm(err[:3])) < 0.01, np.asarray(err)
    assert float(jnp.linalg.norm(err[3:])) < 0.03, np.asarray(err)
    assert float(res.fitness) < 0.05


def test_gicp_converges_from_coarse_init():
    # simulates the coarse-to-fine path: Quatro leaves ~0.3m/3deg error
    src, mask = _room_cloud(2048, seed=5, noise=0.005)
    T_true = se3.se3_exp(jnp.array([0.0, 0.0, 0.5, 2.0, 1.0, 0.0]))
    dst = se3.transform_points(src, T_true)
    init = se3.se3_exp(jnp.array([0.0, 0.0, 0.45, 1.8, 1.2, 0.05]))
    res = gicp.align(src, mask, dst, mask, init_T=init, cov_backend="brute")
    err = se3.se3_log(se3.pose_between(res.transform, T_true))
    assert float(jnp.linalg.norm(err[3:])) < 0.05, np.asarray(err)
    assert float(res.fitness) < 0.05


def test_gicp_fitness_gates_bad_alignment():
    # two unrelated clouds -> poor fitness, above the 1.5 acceptance gate
    src, smask = _room_cloud(1024, seed=6)
    world2 = sim.World.corridor()
    dst_np = world2.sample_points(1024, seed=7, noise=0.01)
    dst = jnp.asarray(dst_np) + jnp.array([100.0, 100.0, 0.0])
    dmask = jnp.ones(1024, bool)
    fit = gicp.fitness_score(src, smask, dst, dmask, jnp.eye(4))
    assert float(fit) > 1.5


def test_gicp_respects_masks():
    src, mask = _room_cloud(512, seed=8)
    # garbage in padded region must not affect result
    src_pad = jnp.concatenate([src, jnp.full((128, 3), 777.0)], axis=0)
    mask_pad = jnp.concatenate([mask, jnp.zeros(128, bool)])
    T_true = se3.se3_exp(jnp.array([0.0, 0.0, 0.1, 0.2, 0.0, 0.0]))
    dst = se3.transform_points(src, T_true)
    dst_pad = jnp.concatenate([dst, jnp.full((128, 3), -888.0)], axis=0)
    res_pad = gicp.align(src_pad, mask_pad, dst_pad, mask_pad, cov_backend="brute")
    err = se3.se3_log(se3.pose_between(res_pad.transform, T_true))
    assert float(jnp.linalg.norm(err)) < 0.05
