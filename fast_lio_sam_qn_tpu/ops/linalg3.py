"""Small fixed-size linear algebra, batched and TPU-friendly.

3x3 symmetric eigendecomposition via cyclic Jacobi sweeps (a fixed number of
fully-vectorized rotation steps — no data-dependent control flow, machine
precision after ~6 sweeps), closed-form 3x3 inverse, and a damped 6x6 solve.
These replace the Eigen/GTSAM dense routines the reference leans on; on TPU,
jnp.linalg.eigh on huge batches of tiny matrices lowers poorly, while Jacobi
is pure VPU element-wise work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _jacobi_rotation(A: jax.Array, V: jax.Array, p: int, q: int):
    """One (p,q) Jacobi rotation on batched symmetric (...,3,3) A, tracking V."""
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]
    # rotation angle: theta = 0.5 atan2(2 apq, aqq - app)
    theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]

    # G = I with [p,p]=c [q,q]=c [p,q]=s [q,p]=-s ; A <- G^T A G, V <- V G
    rp = A[..., :, p]
    rq = A[..., :, q]
    Ap = c * rp - s * rq
    Aq = s * rp + c * rq
    A = A.at[..., :, p].set(Ap).at[..., :, q].set(Aq)
    rp = A[..., p, :]
    rq = A[..., q, :]
    Ap = c * rp - s * rq
    Aq = s * rp + c * rq
    A = A.at[..., p, :].set(Ap).at[..., q, :].set(Aq)
    vp = V[..., :, p]
    vq = V[..., :, q]
    Vp = c * vp - s * vq
    Vq = s * vp + c * vq
    V = V.at[..., :, p].set(Vp).at[..., :, q].set(Vq)
    return A, V


def eigh3(A: jax.Array, sweeps: int = 6):
    """Batched symmetric 3x3 eigendecomposition.

    Returns (eigvals (...,3) ascending, eigvecs (...,3,3) columns).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape).copy()
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    vals = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    order = jnp.argsort(vals, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return vals, V


def inv3(A: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse via adjugate (regularize upstream)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    # clamp magnitude away from zero, preserving sign (the previous form
    # evaluated to exactly 0 for small NEGATIVE determinants -> inf)
    det_safe = jnp.where(det >= 0, jnp.maximum(det, _EPS),
                         jnp.minimum(det, -_EPS))
    inv_det = 1.0 / det_safe
    adj = jnp.stack(
        [
            jnp.stack([A00, A01, A02], axis=-1),
            jnp.stack([A10, A11, A12], axis=-1),
            jnp.stack([A20, A21, A22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve6(H: jax.Array, b: jax.Array, damping: float = 0.0) -> jax.Array:
    """Solve (H + damping*diag(H)) x = b for 6x6 SPD H via Cholesky.

    Uses jnp.linalg.solve (batched LU) — 6x6 is tiny; keep full precision.
    """
    if damping:
        diag = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-6)
        H = H + damping * diag[..., None] * jnp.eye(6, dtype=H.dtype)
    return jnp.linalg.solve(H, b[..., None])[..., 0]
