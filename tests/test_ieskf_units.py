"""Unit-level validation of the IESEKF internals (finite differences)."""
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import ieskf, se3


def _propagate_once(nav, dt, gyro, acc):
    """One manual nominal-state step (mirrors ieskf.propagate's step)."""
    w_c = gyro - nav.bg
    a_c = acc - nav.ba
    a_w = nav.R @ a_c + nav.grav
    return ieskf.NavState(
        R=np.asarray(nav.R) @ np.asarray(se3.so3_exp(jnp.asarray(w_c * dt))),
        p=nav.p + nav.v * dt + 0.5 * a_w * dt * dt,
        v=nav.v + a_w * dt,
        bg=nav.bg, ba=nav.ba, grav=nav.grav,
    )


def test_transition_jacobian_finite_difference():
    """F from _step_jacobians must match d(boxminus(step(boxplus(x,dx))),
    step(x)) / d dx for small dx."""
    rng = np.random.default_rng(0)
    nav = ieskf.NavState(
        R=np.asarray(se3.so3_exp(jnp.array([0.2, -0.1, 0.3]))),
        p=np.array([1.0, 2.0, 3.0]),
        v=np.array([0.5, -0.2, 0.1]),
        bg=np.array([0.01, -0.02, 0.005]),
        ba=np.array([0.05, 0.02, -0.03]),
        grav=np.array([0.0, 0.0, -9.81]),
    )
    dt = 0.005
    gyro = np.array([0.1, -0.3, 0.5])
    acc = np.array([0.2, 9.7, 1.0])

    F = np.asarray(ieskf._step_jacobians(
        jnp.asarray(nav.R, jnp.float32), jnp.asarray(acc - nav.ba,
                                                     jnp.float32),
        jnp.asarray(gyro - nav.bg, jnp.float32), dt, jnp.float32))

    base = _propagate_once(nav, dt, gyro, acc)

    def boxminus(a, b):
        """18-dim error of state a wrt b (right perturbation)."""
        dth = np.asarray(se3.so3_log(jnp.asarray(
            b.R.T @ a.R, jnp.float32)))
        return np.concatenate([
            dth, a.p - b.p, a.v - b.v, a.bg - b.bg, a.ba - b.ba,
            a.grav - b.grav])

    eps = 1e-4
    F_num = np.zeros((18, 18))
    for i in range(18):
        dx = np.zeros(18)
        dx[i] = eps
        pert = ieskf.NavState(
            R=nav.R @ np.asarray(se3.so3_exp(jnp.asarray(dx[0:3],
                                                         jnp.float32))),
            p=nav.p + dx[3:6], v=nav.v + dx[6:9],
            bg=nav.bg + dx[9:12], ba=nav.ba + dx[12:15],
            grav=nav.grav + dx[15:18])
        stepped = _propagate_once(pert, dt, gyro, acc)
        F_num[:, i] = boxminus(stepped, base) / eps
    # rotation rows involve so3_log of near-identity products: tolerance
    # loose enough for f32 finite differences, tight enough to catch sign
    # or placement errors (entries are O(dt)=5e-3 or O(1))
    np.testing.assert_allclose(F, F_num, atol=5e-3)


def test_covariance_grows_without_measurements():
    nav = ieskf.identity_state()
    P0 = ieskf.init_covariance()
    k = 16
    ts = jnp.asarray(np.arange(1, k + 1) * 0.005, jnp.float32)
    gyro = jnp.zeros((k, 3))
    acc = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (k, 1))
    mask = jnp.ones(k, bool)
    nav1, P1, log = ieskf.propagate(
        nav, P0, ts, gyro, acc, mask, jnp.float32(0.0), jnp.float32(0.085),
        jnp.array([0.1, 0.1, 1e-4, 1e-4]))
    # position/velocity variance strictly grows; symmetric PSD
    assert float(P1[3, 3]) > float(P0[3, 3])
    assert float(P1[6, 6]) > float(P0[6, 6])
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P1).T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(np.asarray(P1)) > -1e-7)


def test_update_tightens_pose_covariance():
    """A point-to-plane update against a known map must reduce pose
    uncertainty and not corrupt the state when the prior is correct."""
    from fast_lio_sam_qn_tpu.ops import hashgrid
    from fast_lio_sam_qn_tpu.utils import sim

    world = sim.World.room(size=16.0, height=4.0, n_boxes=5, seed=1)
    map_pts = jnp.asarray(world.sample_points(6000, seed=2, noise=0.0))
    grid = hashgrid.build(map_pts, jnp.ones(6000, bool), res=0.3,
                          table_size=1 << 15)
    scan = jnp.asarray(world.sample_points(1500, seed=3, noise=0.005))
    nav = ieskf.identity_state()  # truth: scan already in world frame
    P0 = ieskf.init_covariance()
    nav1, P1, matches = ieskf.update(
        nav, P0, grid, scan, jnp.ones(1500, bool),
        meas_var=jnp.float32(0.0025), plane_threshold=jnp.float32(0.1),
        max_iter=3, plane_k=5, window=3)
    assert int(matches) > 300
    # pose block shrinks
    assert float(jnp.trace(P1[:6, :6])) < float(jnp.trace(P0[:6, :6]))
    # state unchanged (it was already correct)
    assert float(jnp.linalg.norm(nav1.p - nav.p)) < 0.02
    rot_err = se3.so3_log(jnp.matmul(nav.R.T, nav1.R))
    assert float(jnp.linalg.norm(rot_err)) < 0.01


def test_deskew_continuous_at_sample_boundaries():
    """The interpolated pose must be continuous across IMU sample times and
    consistent with the propagation: R(t_i^-) extrapolated from t_{i-1}
    with the gyro propagate() integrates that interval with must land on
    the logged R(t_i) (round-3 review: the extrapolation used the PREVIOUS
    interval's gyro, giving ~mrad jumps under angular acceleration)."""
    rng = np.random.default_rng(2)
    k = 8
    dt = 0.005
    ts = (np.arange(k) + 1) * dt
    # strongly time-varying gyro so the lagged choice is visible
    gyro = np.stack([np.linspace(0.2, 2.0, k),
                     np.linspace(-1.0, 1.0, k),
                     np.linspace(0.5, -0.5, k)], -1).astype(np.float32)
    acc = np.tile(np.array([0.0, 0.0, 9.81], np.float32), (k, 1))
    nav = ieskf.NavState(
        R=jnp.eye(3), p=jnp.zeros(3), v=jnp.zeros(3),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
        grav=jnp.array([0.0, 0.0, -9.81]))
    P0 = jnp.eye(ieskf.STATE_DIM) * 1e-4
    noise = jnp.array([1e-4, 1e-3, 1e-6, 1e-6])
    s_end, _, log = ieskf.propagate(
        nav, P0, jnp.asarray(ts), jnp.asarray(gyro), jnp.asarray(acc),
        jnp.ones(k, bool), jnp.float32(0.0), jnp.float32(ts[-1]),
        noise)
    # a body point deskewed at t_i - eps vs exactly t_i must agree to
    # O(eps); with the lagged gyro the mismatch is O(dgyro * dt) instead
    eps = 1e-5
    i = 4
    pt = jnp.asarray([[10.0, 0.0, 0.0]], jnp.float32)
    q_before = ieskf.deskew(
        pt, jnp.asarray([ts[i] - eps], jnp.float32), jnp.ones(1, bool),
        log, s_end, jnp.float32(0.0), jnp.eye(3), jnp.zeros(3))
    q_at = ieskf.deskew(
        pt, jnp.asarray([ts[i]], jnp.float32), jnp.ones(1, bool),
        log, s_end, jnp.float32(0.0), jnp.eye(3), jnp.zeros(3))
    jump = float(jnp.linalg.norm(q_before - q_at))
    # lagged-gyro jump at this workload is ~|dw|*dt*|p| ~ 2e-3 m; the
    # consistent choice leaves only O(eps) + float noise
    assert jump < 2e-4, jump
