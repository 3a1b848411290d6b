"""Iterated error-state Kalman filter LiDAR-inertial odometry core.

The TPU-native re-derivation of FAST-LIO2 (the reference's L1 layer — empty
submodule ``third_party/FAST_LIO``, behavior reconstructed from the exact
config surface in ``third_party/fastlio_config_launch/kitti.yaml:8-27`` /
``kitti.launch:6-12`` and the published method, arXiv:2107.06829 [external]):

- forward IMU propagation of the 18-dim error state
  (dtheta, dp, dv, dbg, dba, dg) with covariance,
- backward per-point motion compensation (deskew) to the scan-end frame,
- an iterated point-to-plane MAP update (``max_iteration`` GN steps, each
  re-searching plane correspondences) against a voxel-hash local map
  (ops/hashgrid.py) instead of the ikd-tree,
- add-if-voxel-empty map insertion at ``filter_size_map`` resolution.

Everything is one fixed-shape jitted program per scan: IMU samples and scan
points are padded+masked; the per-point plane search is a windowed key-
verified gather; the 18x18 update solve is dense (only the pose 6x6 block of
H^T R^-1 H is nonzero because point-to-plane rows involve only dtheta/dp).

Documented simplifications vs upstream FAST-LIO2: the box-plus Jacobian in
the iterated update is taken as identity (errors are small per scan); the
local map keeps one representative point per voxel (iVox-style) rather than
up to N; gravity is a plain 3-vector state (upstream uses S2).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hashgrid, linalg3, se3, surfel_map

# error-state layout
_TH, _P, _V, _BG, _BA, _G = 0, 3, 6, 9, 12, 15
STATE_DIM = 18
# optional online LiDAR-IMU extrinsic block (FAST-LIO2's extrinsic_est_en,
# third_party/fastlio_config_launch/kitti.yaml:22): appended so every
# existing 18-dim index stays valid and the disabled path is untouched.
_RLI, _TLI = 18, 21
STATE_DIM_EXT = 24


def _ptransform(pts, R, t=None):
    """points @ R^T (+ t) at full f32 precision — raw `@` runs bf16 passes
    on TPU, which at 50-100 m point ranges costs 0.1-0.4 m per transform
    (the plane_threshold scale)."""
    out = jnp.einsum("ni,ji->nj", pts, R, precision="highest")
    return out if t is None else out + t



class NavState(NamedTuple):
    R: jax.Array      # (3,3) world<-body
    p: jax.Array      # (3,)
    v: jax.Array      # (3,)
    bg: jax.Array     # (3,)
    ba: jax.Array     # (3,)
    grav: jax.Array   # (3,) world gravity vector (~[0,0,-9.81])


def identity_state(dtype=jnp.float32) -> NavState:
    return NavState(
        R=jnp.eye(3, dtype=dtype),
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=jnp.array([0.0, 0.0, -9.81], dtype),
    )


def init_covariance(dtype=jnp.float32, est_extrinsic: bool = False
                    ) -> jax.Array:
    """18x18 filter covariance, or 24x24 when the LiDAR-IMU extrinsic is
    co-estimated (extrinsic prior: ~1.8 deg rot / ~3 cm trans std — the
    extrinsic_T/extrinsic_R config is treated as a decent initial guess,
    as upstream FAST-LIO2 does [external])."""
    d = jnp.concatenate([
        jnp.full(3, 1e-4), jnp.full(3, 1e-4), jnp.full(3, 1e-2),
        jnp.full(3, 1e-4), jnp.full(3, 1e-3), jnp.full(3, 1e-3),
    ] + ([jnp.full(3, 1e-3), jnp.full(3, 1e-3)] if est_extrinsic else [])
    ).astype(dtype)
    return jnp.diag(d)


class Extrinsic(NamedTuple):
    """LiDAR->IMU extrinsic as filter state: p_body = R @ p_lidar + t."""

    R: jax.Array  # (3,3)
    t: jax.Array  # (3,)


def boxplus_ext(e: Extrinsic, dx6: jax.Array) -> Extrinsic:
    """Right-perturbation retraction of the extrinsic block."""
    return Extrinsic(
        R=se3.compose3(e.R, se3.so3_exp(dx6[:3])), t=e.t + dx6[3:])


def boxplus(s: NavState, dx: jax.Array) -> NavState:
    """Right-perturbation state retraction."""
    return NavState(
        R=se3.compose3(s.R, se3.so3_exp(dx[_TH:_TH + 3])),
        p=s.p + dx[_P:_P + 3],
        v=s.v + dx[_V:_V + 3],
        bg=s.bg + dx[_BG:_BG + 3],
        ba=s.ba + dx[_BA:_BA + 3],
        grav=s.grav + dx[_G:_G + 3],
    )


class PropagationLog(NamedTuple):
    """Per-IMU-sample states during the sweep, for backward deskew."""

    t: jax.Array     # (K,) sample times (sec, relative to scan start)
    R: jax.Array     # (K,3,3)
    p: jax.Array     # (K,3)
    v: jax.Array     # (K,3)
    w: jax.Array     # (K,3) bias-corrected gyro at sample
    valid: jax.Array  # (K,)


def _step_jacobians(R, acc_c, w_c, dt, dtype, dim=STATE_DIM):
    """Error-state transition F (dim x dim) for one IMU step (right-
    perturbation local error; standard ESKF discrete forms). With
    dim=STATE_DIM_EXT the extrinsic block is identity with no coupling —
    a near-constant parameter driven only by its random-walk Q rows."""
    F = jnp.eye(dim, dtype=dtype)
    Rw = se3.so3_exp(-w_c * dt)
    F = F.at[_TH:_TH + 3, _TH:_TH + 3].set(Rw)
    F = F.at[_TH:_TH + 3, _BG:_BG + 3].set(-jnp.eye(3, dtype=dtype) * dt)
    F = F.at[_P:_P + 3, _V:_V + 3].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[_V:_V + 3, _TH:_TH + 3].set(
        -jnp.matmul(R, se3.hat(acc_c), precision="highest") * dt)
    F = F.at[_V:_V + 3, _BA:_BA + 3].set(-R * dt)
    F = F.at[_V:_V + 3, _G:_G + 3].set(jnp.eye(3, dtype=dtype) * dt)
    return F


@functools.partial(jax.jit, static_argnames=())
def propagate(
    state: NavState,
    P: jax.Array,
    imu_t: jax.Array,     # (K,) sample times within the scan, padded
    gyro: jax.Array,      # (K,3)
    acc: jax.Array,       # (K,3)
    imu_mask: jax.Array,  # (K,)
    t_start: jax.Array,
    t_end: jax.Array,
    noise: jax.Array,     # (4,) [gyr_cov, acc_cov, b_gyr_cov, b_acc_cov];
                          # with a 24-dim P: (6,), rows 4/5 = extrinsic
                          # random walk (rot rad^2/s, trans m^2/s)
):
    """Forward-propagate through the scan's IMU samples; returns the state at
    t_end, covariance, and the per-sample pose log for deskew.

    Shape-generic in P: an 18x18 covariance propagates the nav state only; a
    24x24 one (est_extrinsic) additionally carries the constant extrinsic
    block and its nav cross-covariances through F P F^T."""
    dtype = P.dtype
    dim = P.shape[0]

    def step(carry, inp):
        s, Pc, t_prev = carry
        t_i, w_i, a_i, m_i = inp
        dt = jnp.where(m_i, jnp.maximum(t_i - t_prev, 0.0), 0.0)
        w_c = w_i - s.bg
        a_c = a_i - s.ba
        a_w = jnp.matmul(s.R, a_c, precision="highest") + s.grav
        R_new = se3.compose3(s.R, se3.so3_exp(w_c * dt))
        p_new = s.p + s.v * dt + 0.5 * a_w * dt * dt
        v_new = s.v + a_w * dt
        F = _step_jacobians(s.R, a_c, w_c, dt, dtype, dim)
        Q = jnp.zeros((dim,), dtype)
        Q = Q.at[_TH:_TH + 3].set(noise[0] * dt)
        Q = Q.at[_V:_V + 3].set(noise[1] * dt)
        Q = Q.at[_BG:_BG + 3].set(noise[2] * dt)
        Q = Q.at[_BA:_BA + 3].set(noise[3] * dt)
        if dim == STATE_DIM_EXT:
            # slow extrinsic random walk: prevents the ext covariance from
            # freezing permanently after transients in weakly-observable
            # directions (noise rows 4=rot, 5=trans; rad^2/s, m^2/s)
            Q = Q.at[_RLI:_RLI + 3].set(noise[4] * dt)
            Q = Q.at[_TLI:_TLI + 3].set(noise[5] * dt)
        P_new = jnp.matmul(
            jnp.matmul(F, Pc, precision="highest"),
            F.T, precision="highest",
        ) + jnp.diag(Q)
        s_new = NavState(R_new, p_new, v_new, s.bg, s.ba, s.grav)
        s_out = jax.tree.map(
            lambda a, b: jnp.where(m_i, a, b), s_new, s)
        P_out = jnp.where(m_i, P_new, Pc)
        t_out = jnp.where(m_i, t_i, t_prev)
        log = (t_out, s_out.R, s_out.p, s_out.v, w_c)
        return (s_out, P_out, t_out), log

    (s_mid, P_mid, t_last), (lt, lR, lp, lv, lw) = jax.lax.scan(
        step, (state, P, t_start), (imu_t, gyro, acc, imu_mask)
    )
    # tail: propagate from last sample to t_end with the last measurement.
    # With NO valid samples in the scan (IMU dropout) the padding rows are
    # zeros, which would integrate raw gravity into v/p (free fall);
    # fall back to constant-velocity, zero-rotation propagation instead.
    any_imu = jnp.any(imu_mask)
    last_i = jnp.maximum(jnp.sum(imu_mask.astype(jnp.int32)) - 1, 0)
    dt_tail = jnp.maximum(t_end - t_last, 0.0)
    w_c = jnp.where(any_imu, gyro[last_i] - s_mid.bg, 0.0)
    a_c = jnp.where(any_imu, acc[last_i] - s_mid.ba, 0.0)
    a_w = jnp.where(
        any_imu,
        jnp.matmul(s_mid.R, a_c, precision="highest") + s_mid.grav, 0.0)
    s_end = NavState(
        R=se3.compose3(s_mid.R, se3.so3_exp(w_c * dt_tail)),
        p=s_mid.p + s_mid.v * dt_tail + 0.5 * a_w * dt_tail * dt_tail,
        v=s_mid.v + a_w * dt_tail,
        bg=s_mid.bg, ba=s_mid.ba, grav=s_mid.grav,
    )
    F = _step_jacobians(s_mid.R, a_c, w_c, dt_tail, dtype, dim)
    Q_tail = jnp.zeros((dim,), dtype)
    Q_tail = Q_tail.at[_TH:_TH + 3].set(noise[0] * dt_tail)
    Q_tail = Q_tail.at[_V:_V + 3].set(noise[1] * dt_tail)
    Q_tail = Q_tail.at[_BG:_BG + 3].set(noise[2] * dt_tail)
    Q_tail = Q_tail.at[_BA:_BA + 3].set(noise[3] * dt_tail)
    if dim == STATE_DIM_EXT:
        Q_tail = Q_tail.at[_RLI:_RLI + 3].set(noise[4] * dt_tail)
        Q_tail = Q_tail.at[_TLI:_TLI + 3].set(noise[5] * dt_tail)
    P_end = jnp.matmul(jnp.matmul(F, P_mid, precision="highest"), F.T,
                       precision="highest") + jnp.diag(Q_tail)
    log = PropagationLog(t=lt, R=lR, p=lp, v=lv, w=lw, valid=imu_mask)
    return s_end, P_end, log


@functools.partial(jax.jit, static_argnames=())
def deskew(
    points_l: jax.Array,   # (N,3) lidar-frame raw points
    rel_t: jax.Array,      # (N,) point times relative to scan start
    mask: jax.Array,
    log: PropagationLog,
    state_end: NavState,
    t_start: jax.Array,
    R_li: jax.Array,       # (3,3) lidar->imu extrinsic rotation
    t_li: jax.Array,       # (3,)
):
    """Motion-compensate points to the scan-END body(IMU) frame.

    q_i = R_end^T (R(t_i) (R_li p_i + t_li) + p(t_i) - p_end)
    with R(t), p(t) interpolated from the propagation log (piecewise constant
    velocity / gyro within IMU intervals).
    """
    t_abs = t_start + rel_t
    # index of the latest valid log sample with t <= t_abs.  A masked argmax
    # (not searchsorted) so the result is correct for ANY imu_mask layout —
    # invalid samples need not form a suffix.
    k = log.t.shape[0]
    le = log.valid[None, :] & (log.t[None, :] <= t_abs[:, None])   # (N, K)
    score = jnp.where(le, jnp.arange(k, dtype=jnp.int32)[None, :], -1)
    idx = jnp.max(score, axis=1)                                   # -1: none
    has_prev = idx >= 0
    # points BEFORE the first valid sample: use the first valid sample's
    # pose with dt = 0 (no extrapolation)
    first_valid = jnp.argmax(log.valid)
    idx = jnp.where(has_prev, jnp.maximum(idx, 0), first_valid)
    any_valid = jnp.any(log.valid)
    t_i = jnp.where(has_prev, log.t[idx], t_abs)
    dt = jnp.maximum(t_abs - t_i, 0.0)
    # extrapolate with the gyro of the interval the point falls IN: the
    # propagation integrates (t_i, t_{i+1}] with sample i+1's measurement
    # (log.w[i] is the gyro of the interval ENDING at t_i), so rotating
    # forward from t_i must use the NEXT valid sample's w — using w[idx]
    # lags one interval and is discontinuous at sample boundaries (~2.5
    # mrad at 200 Hz under 0.5 rad/s^2 gyro change). Points past the last
    # sample keep w[idx]: the tail segment propagates with the last
    # measurement (propagate(), tail block).
    gt = log.valid[None, :] & (log.t[None, :] > t_abs[:, None])     # (N, K)
    score_n = jnp.where(gt, jnp.arange(k, dtype=jnp.int32)[None, :], k)
    nidx = jnp.min(score_n, axis=1)
    has_next = nidx < k
    Rk, pk, vk = log.R[idx], log.p[idx], log.v[idx]
    wk = jnp.where(has_next[:, None],
                   log.w[jnp.minimum(nidx, k - 1)], log.w[idx])
    R_t = jnp.matmul(Rk, se3.so3_exp(wk * dt[:, None]), precision="highest")
    p_t = pk + vk * dt[:, None]
    p_b = _ptransform(points_l, R_li, t_li)
    p_w = jnp.einsum("nij,nj->ni", R_t, p_b, precision="highest") + p_t
    q = jnp.einsum("ni,ij->nj", p_w - state_end.p,
                   state_end.R, precision="highest")  # R^T x
    # degenerate case (no IMU in scan): fall back to no deskew
    q = jnp.where(any_valid, q, p_b)
    return jnp.where(mask[:, None], q, 0.0)


@functools.partial(jax.jit, static_argnames=("plane_k", "window"))
def _plane_correspondences(
    grid: hashgrid.HashGrid,
    pts_w: jax.Array,
    mask: jax.Array,
    plane_k: int,
    plane_threshold: jax.Array,
    window: int = 3,
):
    """For each world point: fit a plane to its plane_k map neighbors.

    Returns (normal (N,3), dist_resid (N,) = n.p + d, valid (N,)).
    """
    nn_pts, nn_d2, nn_valid = hashgrid.query_knn(
        grid, pts_w, mask, k=plane_k, window=window
    )
    w = nn_valid.astype(pts_w.dtype)
    cnt = jnp.sum(w, axis=-1)
    mean = jnp.sum(nn_pts * w[..., None], -2) / jnp.maximum(cnt, 1.0)[..., None]
    d = (nn_pts - mean[..., None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d, precision="highest")
    vals, vecs = linalg3.eigh3(cov)
    n = vecs[..., :, 0]  # smallest-eigval direction = plane normal
    d0 = -jnp.sum(n * mean, axis=-1)
    # plane quality: all k neighbors within plane_threshold of the plane
    fit_res = jnp.abs(jnp.einsum("nkj,nj->nk", nn_pts, n,
                                 precision="highest") + d0[:, None])
    good_fit = jnp.all(jnp.where(nn_valid, fit_res < plane_threshold, True), -1)
    valid = mask & (cnt >= plane_k) & good_fit
    resid = jnp.sum(n * pts_w, axis=-1) + d0
    return n, resid, valid


def _pose_rows(pts_b, s, n):
    """Point-to-plane measurement rows, pose block only: H rows are
    [ -n^T R hat(q) | n^T | 0... ] under a right-perturbation on R;
    a^T hat(q) = (a x q)^T, so -n^T R hat(q) = (q x (R^T n))^T."""
    Rtn = jnp.einsum("ji,nj->ni", s.R, n, precision="highest")
    return jnp.concatenate([jnp.cross(pts_b, Rtn), n], axis=-1)  # (N, 6)


def _gn_step(s, dx_acc, pts_b, n, resid, w, Pinv):
    """One MAP Gauss-Newton step shared by both update backends:
    A = H^T W H (6x6 pose block), b = H^T W r, plus the prior term
    minimizing ||dx_acc + dx||_Pinv (error accumulated from the prior)."""
    dtype = Pinv.dtype
    h6 = _pose_rows(pts_b, s, n)
    A6 = jnp.einsum("na,nb,n->ab", h6, h6, w, precision="highest")
    b6 = jnp.einsum("na,n,n->a", h6, resid, w, precision="highest")
    A = jnp.zeros((STATE_DIM, STATE_DIM), dtype).at[:6, :6].set(A6)
    b = jnp.zeros((STATE_DIM,), dtype).at[:6].set(b6)
    rhs = -(b + jnp.matmul(Pinv, dx_acc, precision="highest"))
    dx = jnp.linalg.solve(A + Pinv, rhs)
    return boxplus(s, dx), dx_acc + dx


def _posterior_cov(s_fin, pts_b, n, w, Pinv):
    """Posterior covariance of the MAP estimate at the converged state."""
    dtype = Pinv.dtype
    h6 = _pose_rows(pts_b, s_fin, n)
    A6 = jnp.einsum("na,nb,n->ab", h6, h6, w, precision="highest")
    A = jnp.zeros((STATE_DIM, STATE_DIM), dtype).at[:6, :6].set(A6)
    P_new = jnp.linalg.inv(A + Pinv)
    return 0.5 * (P_new + P_new.T)


@functools.partial(jax.jit, static_argnames=("max_iter", "plane_k", "window"))
def update(
    state: NavState,
    P: jax.Array,
    grid: hashgrid.HashGrid,
    pts_b: jax.Array,      # (N,3) deskewed scan, scan-end body frame
    mask: jax.Array,
    meas_var: jax.Array,   # scalar lidar noise variance (m^2)
    plane_threshold: jax.Array,
    max_iter: int = 3,
    plane_k: int = 5,
    window: int = 3,
):
    """Iterated point-to-plane MAP update (FAST-LIO2 eq. 18-20 [external],
    identity box-plus Jacobian). Re-searches correspondences each iteration.

    Returns (state, P, num_matches)."""
    dtype = P.dtype
    Pinv = jnp.linalg.inv(P + 1e-9 * jnp.eye(STATE_DIM, dtype=dtype))
    state0 = state

    def body(carry, _):
        s, dx_acc = carry
        pts_w = _ptransform(pts_b, s.R, s.p)
        n, resid, valid = _plane_correspondences(
            grid, pts_w, mask, plane_k, plane_threshold, window
        )
        w = valid.astype(dtype) / meas_var
        s_new, dx_acc = _gn_step(s, dx_acc, pts_b, n, resid, w, Pinv)
        return (s_new, dx_acc), None

    (s_fin, _), _ = jax.lax.scan(
        body, (state0, jnp.zeros(STATE_DIM, dtype)), None, length=max_iter
    )
    # posterior covariance + match count, both at the CONVERGED state
    pts_w = _ptransform(pts_b, s_fin.R, s_fin.p)
    n, _, valid = _plane_correspondences(
        grid, pts_w, mask, plane_k, plane_threshold, window
    )
    w = valid.astype(dtype) / meas_var
    P_new = _posterior_cov(s_fin, pts_b, n, w, Pinv)
    return s_fin, P_new, jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("max_iter", "window"))
def update_surfel(
    state: NavState,
    P: jax.Array,
    smap,                  # surfel_map.SurfelMap
    pts_b: jax.Array,      # (N,3) deskewed scan, scan-end body frame
    mask: jax.Array,
    meas_var: jax.Array,
    max_iter: int = 3,
    window: int = 1,
):
    """Iterated point-to-plane MAP update against CACHED surfel planes
    (ops/surfel_map.py): the per-point correspondence is one probed lookup
    — no kNN, no per-point eigendecomposition in the hot loop.

    Returns (state, P, num_matches)."""
    dtype = P.dtype
    Pinv = jnp.linalg.inv(P + 1e-9 * jnp.eye(STATE_DIM, dtype=dtype))

    # Plane association ONCE at the propagated state with the wide window
    # (nearest-centroid over the 27-hood, surfel_map.query_planes): wide
    # search restores the residuals a lagging estimate needs, and holding
    # the association fixed across GN iterations keeps its gather cost out
    # of the iterate loop (per-scan corrections are small; the PLANES are
    # fixed, the residual n.p_w(x)+d is still re-evaluated per iteration).
    pts_w0 = _ptransform(pts_b, state.R, state.p)
    # window=1 relies on halo planes (surfel_map.insert step 4) for reach
    # beyond the mapped surface; window=3 searches the 27-hood per point
    # (5x more accurate under large estimate lag, ~25x more gather traffic
    # — 105 ms vs ~20 ms for a 32k-point scan on v5e)
    n, resid0, valid = surfel_map.query_planes(smap, pts_w0, mask,
                                               window=window)
    # recover d for the chosen planes: resid0 = n.p + d -> d = resid0 - n.p
    d_plane = resid0 - jnp.sum(n * pts_w0, axis=-1)
    w = valid.astype(dtype) / meas_var

    def body(carry, _):
        s, dx_acc = carry
        pts_w = _ptransform(pts_b, s.R, s.p)
        resid = jnp.sum(n * pts_w, axis=-1) + d_plane
        s_new, dx_acc = _gn_step(s, dx_acc, pts_b, n, resid, w, Pinv)
        return (s_new, dx_acc), None

    (s_fin, _), _ = jax.lax.scan(
        body, (state, jnp.zeros(STATE_DIM, dtype)), None, length=max_iter)
    P_new = _posterior_cov(s_fin, pts_b, n, w, Pinv)
    # association is fixed across iterations, so the converged-state match
    # count is simply the (constant) valid count
    return s_fin, P_new, jnp.sum(valid)


# ---------------------------------------------------------------------------
# Online LiDAR-IMU extrinsic co-estimation (FAST-LIO2's extrinsic_est_en,
# third_party/fastlio_config_launch/kitti.yaml:22 [external]).  The 24-dim
# error state appends (dphi_li, dt_li); the measurement model becomes
# p_w = R (R_li p_l + t_li) + p over the deskewed scan in the scan-END
# LIDAR frame, so the extrinsic stays differentiable in the update.
# ---------------------------------------------------------------------------

def _pose_ext_rows(pts_l, p_b, s, ext, n):
    """Point-to-plane rows over the [pose(6) | extrinsic(6)] columns.

    r = n . (R (R_li p_l + t_li) + p) + d, right perturbations:
      d r / d dtheta  = -n^T R hat(p_b)       -> cross(p_b, R^T n)
      d r / d dp      =  n^T
      d r / d dphi_li = -n^T R R_li hat(p_l)  -> cross(p_l, R_li^T R^T n)
      d r / d dt_li   =  n^T R                -> R^T n
    """
    Rtn = jnp.einsum("ji,nj->ni", s.R, n, precision="highest")
    Rlitn = jnp.einsum("ji,nj->ni", ext.R, Rtn, precision="highest")
    return jnp.concatenate(
        [jnp.cross(p_b, Rtn), n, jnp.cross(pts_l, Rlitn), Rtn], axis=-1)


def _scatter_ext_blocks(A12, b12, dtype):
    """Place the dense 12x12 normal equations into the sparse 24-dim layout
    (columns 0:6 pose, 18:24 extrinsic; v/bias/gravity rows are zero)."""
    A = jnp.zeros((STATE_DIM_EXT, STATE_DIM_EXT), dtype)
    A = A.at[:6, :6].set(A12[:6, :6])
    A = A.at[:6, _RLI:].set(A12[:6, 6:])
    A = A.at[_RLI:, :6].set(A12[6:, :6])
    A = A.at[_RLI:, _RLI:].set(A12[6:, 6:])
    b = jnp.zeros((STATE_DIM_EXT,), dtype)
    b = b.at[:6].set(b12[:6]).at[_RLI:].set(b12[6:])
    return A, b


def _gn_step_ext(s, ext, dx_acc, pts_l, p_b, n, resid, w, Pinv):
    """One MAP Gauss-Newton step of the 24-dim state (mirror of _gn_step)."""
    dtype = Pinv.dtype
    h12 = _pose_ext_rows(pts_l, p_b, s, ext, n)
    A12 = jnp.einsum("na,nb,n->ab", h12, h12, w, precision="highest")
    b12 = jnp.einsum("na,n,n->a", h12, resid, w, precision="highest")
    A, b = _scatter_ext_blocks(A12, b12, dtype)
    rhs = -(b + jnp.matmul(Pinv, dx_acc, precision="highest"))
    dx = jnp.linalg.solve(A + Pinv, rhs)
    return (boxplus(s, dx[:STATE_DIM]), boxplus_ext(ext, dx[_RLI:]),
            dx_acc + dx)


def _posterior_cov_ext(s_fin, ext_fin, pts_l, n, w, Pinv):
    dtype = Pinv.dtype
    p_b = _ptransform(pts_l, ext_fin.R, ext_fin.t)
    h12 = _pose_ext_rows(pts_l, p_b, s_fin, ext_fin, n)
    A12 = jnp.einsum("na,nb,n->ab", h12, h12, w, precision="highest")
    A, _ = _scatter_ext_blocks(A12, jnp.zeros(12, dtype), dtype)
    P_new = jnp.linalg.inv(A + Pinv)
    return 0.5 * (P_new + P_new.T)


@functools.partial(jax.jit, static_argnames=("max_iter", "window"))
def update_surfel_ext(
    state: NavState,
    ext: Extrinsic,
    P: jax.Array,          # (24,24)
    smap,                  # surfel_map.SurfelMap
    pts_l: jax.Array,      # (N,3) deskewed scan, scan-END LIDAR frame
    mask: jax.Array,
    meas_var: jax.Array,
    max_iter: int = 3,
    window: int = 1,
):
    """update_surfel with online extrinsic co-estimation.  Unlike
    update_surfel, the plane ASSOCIATION is re-searched every iteration:
    calibration transients displace points by several voxels, and a fixed
    wrong association would collapse the extrinsic covariance onto a wrong
    estimate (measured: t_z frozen 10 cm off truth with fixed association,
    mm-converged with re-association).  Returns (state, ext, P, matches)."""
    dtype = P.dtype
    Pinv = jnp.linalg.inv(P + 1e-9 * jnp.eye(STATE_DIM_EXT, dtype=dtype))

    def associate(s, e):
        p_b = _ptransform(pts_l, e.R, e.t)
        pts_w = _ptransform(p_b, s.R, s.p)
        n, resid, valid = surfel_map.query_planes(smap, pts_w, mask,
                                                  window=window)
        return p_b, n, resid, valid

    def body(carry, _):
        s, e, dx_acc = carry
        p_b, n, resid, valid = associate(s, e)
        w = valid.astype(dtype) / meas_var
        s_new, e_new, dx_acc = _gn_step_ext(
            s, e, dx_acc, pts_l, p_b, n, resid, w, Pinv)
        return (s_new, e_new, dx_acc), None

    (s_fin, e_fin, _), _ = jax.lax.scan(
        body, (state, ext, jnp.zeros(STATE_DIM_EXT, dtype)), None,
        length=max_iter)
    _, n, _, valid = associate(s_fin, e_fin)
    w = valid.astype(dtype) / meas_var
    P_new = _posterior_cov_ext(s_fin, e_fin, pts_l, n, w, Pinv)
    return s_fin, e_fin, P_new, jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("max_iter", "plane_k", "window"))
def update_ext(
    state: NavState,
    ext: Extrinsic,
    P: jax.Array,          # (24,24)
    grid: hashgrid.HashGrid,
    pts_l: jax.Array,      # (N,3) deskewed scan, scan-END LIDAR frame
    mask: jax.Array,
    meas_var: jax.Array,
    plane_threshold: jax.Array,
    max_iter: int = 3,
    plane_k: int = 5,
    window: int = 3,
):
    """update (point-map backend) with online extrinsic co-estimation:
    correspondences are re-searched each iteration at the current pose AND
    extrinsic.  Returns (state, ext, P, num_matches)."""
    dtype = P.dtype
    Pinv = jnp.linalg.inv(P + 1e-9 * jnp.eye(STATE_DIM_EXT, dtype=dtype))

    def body(carry, _):
        s, e, dx_acc = carry
        p_b = _ptransform(pts_l, e.R, e.t)
        pts_w = _ptransform(p_b, s.R, s.p)
        n, resid, valid = _plane_correspondences(
            grid, pts_w, mask, plane_k, plane_threshold, window)
        w = valid.astype(dtype) / meas_var
        s_new, e_new, dx_acc = _gn_step_ext(
            s, e, dx_acc, pts_l, p_b, n, resid, w, Pinv)
        return (s_new, e_new, dx_acc), None

    (s_fin, e_fin, _), _ = jax.lax.scan(
        body, (state, ext, jnp.zeros(STATE_DIM_EXT, dtype)), None,
        length=max_iter)
    p_b = _ptransform(pts_l, e_fin.R, e_fin.t)
    pts_w = _ptransform(p_b, s_fin.R, s_fin.p)
    n, _, valid = _plane_correspondences(
        grid, pts_w, mask, plane_k, plane_threshold, window)
    w = valid.astype(dtype) / meas_var
    P_new = _posterior_cov_ext(s_fin, e_fin, pts_l, n, w, Pinv)
    return s_fin, e_fin, P_new, jnp.sum(valid)
