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


def eigh3_soa(a00, a01, a02, a11, a12, a22, sweeps: int = 6):
    """Cyclic-Jacobi symmetric 3x3 eigendecomposition in STRUCT-OF-ARRAYS
    form: six (...,) component arrays in, ((e0, e1, e2) ascending,
    v[i][j] eigenvector components, column j per eigenvalue j) out.

    Every operation is an elementwise op on (...,)-shaped arrays, so the
    batch dimension fills the vector lanes.  The (N, 3, 3) formulation put
    the batch on the SUBLANE axis and the 3x3 on lanes — ~2% lane
    utilization plus a dynamic-index relayout per rotation; one (6k, 3, 3)
    eigendecomposition measured 14.5 ms on v5e versus ~0.2 ms for this
    form (round-3 profiling of the FPFH covariance branch)."""
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)

    def one_sweep(_, carry):
        # state as a flat 15-tuple of (...,) arrays: 6 unique symmetric
        # components + 9 eigenvector components. The sweep loop must be a
        # lax.fori_loop — fully unrolling the rotation chain sends XLA:CPU
        # compilation exponential (measured 0.5/1.3/3.1/23/125 s for 1-5
        # unrolled sweeps; optimization_barrier does not save it)
        s00, s01, s02, s11, s12, s22 = carry[:6]
        s = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]
        v = [list(carry[6:9]), list(carry[9:12]), list(carry[12:15])]
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            r = 3 - p - q
            app, aqq, apq = s[p][p], s[q][q], s[p][q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            c = jnp.cos(theta)
            sn = jnp.sin(theta)
            apr, aqr = s[p][r], s[q][r]
            new_pp = c * c * app - 2.0 * sn * c * apq + sn * sn * aqq
            new_qq = sn * sn * app + 2.0 * sn * c * apq + c * c * aqq
            new_pq = sn * c * (app - aqq) + (c * c - sn * sn) * apq
            new_pr = c * apr - sn * aqr
            new_qr = sn * apr + c * aqr
            s[p][p], s[q][q] = new_pp, new_qq
            s[p][q] = s[q][p] = new_pq
            s[p][r] = s[r][p] = new_pr
            s[q][r] = s[r][q] = new_qr
            for i in range(3):
                vip, viq = v[i][p], v[i][q]
                v[i][p] = c * vip - sn * viq
                v[i][q] = sn * vip + c * viq
        return (s[0][0], s[0][1], s[0][2], s[1][1], s[1][2], s[2][2],
                *v[0], *v[1], *v[2])

    out = jax.lax.fori_loop(
        0, sweeps, one_sweep,
        (a00, a01, a02, a11, a12, a22,
         one, zero, zero, zero, one, zero, zero, zero, one))
    s = [[out[0], out[1], out[2]], [out[1], out[3], out[4]],
         [out[2], out[4], out[5]]]
    v = [list(out[6:9]), list(out[9:12]), list(out[12:15])]
    e = [s[0][0], s[1][1], s[2][2]]
    # stable 3-way rank (ties break to the lower index, like a stable sort)
    rank = [
        (e[0] > e[1]).astype(jnp.int32) + (e[0] > e[2]),
        (e[1] >= e[0]).astype(jnp.int32) + (e[1] > e[2]),
        (e[2] >= e[0]).astype(jnp.int32) + (e[2] >= e[1]),
    ]
    def pick(slot, comps):
        out = jnp.zeros_like(comps[0])
        for j in range(3):
            out = jnp.where(rank[j] == slot, comps[j], out)
        return out

    evals = tuple(pick(k, e) for k in range(3))
    evecs = [[pick(k, v[i]) for k in range(3)] for i in range(3)]
    return evals, evecs


def eigh3(A: jax.Array, sweeps: int = 6):
    """Batched symmetric 3x3 eigendecomposition.

    Returns (eigvals (...,3) ascending, eigvecs (...,3,3) columns).
    Thin AoS wrapper over eigh3_soa (see its docstring for why)."""
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    evals, evecs = eigh3_soa(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2], sweeps=sweeps)
    vals = jnp.stack(evals, axis=-1)
    V = jnp.stack([jnp.stack(row, axis=-1) for row in evecs], axis=-2)
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
