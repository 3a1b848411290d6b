import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_lio_sam_qn_tpu.ops import se3


def random_rotations(key, n):
    w = jax.random.normal(key, (n, 3)) * 1.5
    return se3.so3_exp(w)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 3))
    # keep |w| < pi so log returns the same (principal) tangent
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = w / jnp.maximum(norm, 1.0) * jnp.minimum(norm, 2.9)
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-4)


def test_so3_exp_orthonormal():
    R = random_rotations(jax.random.PRNGKey(1), 32)
    eye = jnp.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, np.ones(32), atol=1e-5)


def test_so3_log_near_pi():
    axis = jnp.array([1.0, 0.0, 0.0])
    for theta in [np.pi - 1e-4, np.pi - 1e-2]:
        R = se3.so3_exp(axis * theta)
        w = se3.so3_log(R)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(w)), theta, atol=1e-3)


def test_so3_exp_zero():
    R = se3.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    w = se3.so3_log(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(w), np.zeros(3), atol=1e-7)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (64, 6))
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=5e-5)


def test_pose_inverse_between():
    key = jax.random.PRNGKey(3)
    xi = jax.random.normal(key, (8, 6))
    T = se3.se3_exp(xi)
    Tinv = se3.pose_inverse(T)
    eye = jnp.eye(4)[None].repeat(8, 0)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.asarray(eye), atol=1e-5)
    # a.between(b) == a^-1 b
    Ta, Tb = T[:4], T[4:]
    np.testing.assert_allclose(
        np.asarray(Ta @ se3.pose_between(Ta, Tb)), np.asarray(Tb), atol=1e-5
    )


def test_quat_roundtrip():
    R = random_rotations(jax.random.PRNGKey(4), 128)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
    # w >= 0 canonical
    assert np.all(np.asarray(q[..., 3]) >= 0)


def test_quat_roundtrip_near_pi():
    # rotation by ~pi stresses the Shepperd branch selection
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]:
        a = jnp.array(axis, dtype=jnp.float32)
        a = a / jnp.linalg.norm(a)
        R = se3.so3_exp(a * (np.pi - 1e-3))
        q = se3.rot_to_quat(R)
        np.testing.assert_allclose(
            np.asarray(se3.quat_to_rot(q)), np.asarray(R), atol=1e-4
        )


def test_rpy_roundtrip():
    key = jax.random.PRNGKey(5)
    rpy = jax.random.uniform(key, (64, 3), minval=-1.2, maxval=1.2)
    R = se3.rpy_to_rot(rpy)
    rpy2 = se3.rot_to_rpy(R)
    np.testing.assert_allclose(np.asarray(rpy), np.asarray(rpy2), atol=1e-5)
    # reference round-trip Eig->RPY->Rot is identity (utilities.hpp:67-91)
    np.testing.assert_allclose(
        np.asarray(se3.rpy_to_rot(rpy2)), np.asarray(R), atol=1e-6
    )


def test_transform_points_matches_manual():
    key = jax.random.PRNGKey(6)
    pts = jax.random.normal(key, (100, 3))
    T = se3.se3_exp(jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, -3.0]))
    out = se3.transform_points(pts, T)
    R, t = se3.split_pose(T)
    ref = (np.asarray(R) @ np.asarray(pts).T).T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_pose_distance_keyframe_predicate():
    Ta = se3.make_pose(jnp.eye(3), jnp.array([0.0, 0.0, 0.0]))
    Tb = se3.make_pose(jnp.eye(3), jnp.array([3.0, 4.0, 0.0]))
    assert float(se3.pose_distance(Ta, Tb)) == pytest.approx(5.0, abs=1e-6)


def test_jit_compatible():
    f = jax.jit(lambda xi: se3.se3_log(se3.se3_exp(xi)))
    xi = jnp.array([0.1, 0.2, 0.3, 1.0, -1.0, 0.5])
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-5)


def test_orthonormalize3_projects_drifted_rotation():
    """The LIO's f32 rotation chain drifts off SO(3) (~1e-4 ||R^T R - I||
    per 500 scans) and transpose-inverses downstream then inject phantom
    per-scan rotation — 0.42 m of realtime-pose bias over 640 m, amplified
    unboundedly by loop closures (round-5 long-run golden catch).
    orthonormalize3 must restore orthonormality without changing the
    rotation beyond the drift scale, and be exactly idempotent-ish on a
    true rotation."""
    rng = np.random.default_rng(0)
    R_true = np.asarray(se3.so3_exp(jnp.array([0.3, -0.5, 0.9])), np.float64)
    # drift of the measured scale: a skewed multiplicative perturbation
    E = 1e-4 * rng.standard_normal((3, 3))
    R_bad = jnp.asarray((R_true @ (np.eye(3) + E)).astype(np.float32))
    assert np.linalg.norm(
        np.asarray(R_bad).T @ np.asarray(R_bad) - np.eye(3)) > 5e-5
    R_fix = np.asarray(se3.orthonormalize3(R_bad), np.float64)
    assert np.linalg.norm(R_fix.T @ R_fix - np.eye(3)) < 1e-6
    # stays close to the perturbed rotation (projection, not a reset)
    assert np.linalg.norm(R_fix - R_true) < 5e-4
    # true rotation is (numerically) a fixed point
    R_ok = jnp.asarray(R_true.astype(np.float32))
    assert np.linalg.norm(
        np.asarray(se3.orthonormalize3(R_ok)) - np.asarray(R_ok)) < 1e-6
    # batched shape contract
    batch = jnp.broadcast_to(R_ok, (7, 3, 3))
    out = se3.orthonormalize3(batch)
    assert out.shape == (7, 3, 3)
