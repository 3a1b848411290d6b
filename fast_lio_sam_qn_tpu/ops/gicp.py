"""Covariance-weighted GICP — the Nano-GICP equivalent.

Reproduces the registration behavior the reference consumes from
``nano_gicp::NanoGICP`` (loop_closure.cpp:110-136): per-point plane
covariances from ``correspondences_number`` (k=15) nearest neighbors,
distribution-to-distribution GICP cost minimized by Gauss-Newton with
re-searched nearest-neighbor correspondences each iteration, PCL-style
fitness score, and the converged/threshold acceptance gate
(loop_closure.cpp:129).

TPU-native formulation: all clouds are fixed-shape masked arrays; the NN
search is an exact brute-force masked argmin whose cross term is an MXU
matmul (ops/knn.py); covariances come from windowed hash-grid kNN (default,
reuses the 0.3 m voxel structure) or exact brute kNN; the 3x3
eigendecompositions are batched Jacobi sweeps (ops/linalg3.py); the GN
normal equations are masked einsum reductions.  One jit-compiled program,
no data-dependent shapes; Nano-GICP's OpenMP thread pool (SURVEY §2
parallelism item 3) maps to this batched data parallelism.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hashgrid, linalg3, pallas_knn, se3

# fast_gicp-style plane regularization: eigenvalues replaced by (e, 1, 1)
PLANE_EPS = 1e-3


class GicpResult(NamedTuple):
    transform: jax.Array      # (4, 4) src -> dst
    fitness: jax.Array        # scalar: PCL getFitnessScore (mean sq. NN dist)
    converged: jax.Array      # bool scalar
    num_iters: jax.Array      # int scalar
    num_corr: jax.Array       # int scalar: correspondences in final iter
    degenerate: jax.Array     # bool: solution unconstrained along some dim


@jax.jit
def plane_covariances_from_knn(points, mask, nn_pts, nn_valid):
    """Plane covariances given precomputed kNN neighbor points.

    Lets callers reuse one kNN pass across stages (e.g. FPFH's shared kNN —
    neighbor indices are invariant under rigid transforms, so covariances
    for a transformed cloud are R C R^T of these).  nn_pts (N,K,3),
    nn_valid (N,K).  Returns (covs (N,3,3), valid (N,))."""
    w = nn_valid.astype(points.dtype)
    cnt = jnp.sum(w, axis=-1)
    mean = jnp.sum(nn_pts * w[..., None], axis=-2) / jnp.maximum(
        cnt, 1.0)[..., None]
    d = (nn_pts - mean[..., None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d, precision="highest") / jnp.maximum(
        cnt, 1.0
    )[..., None, None]
    valid = mask & (cnt >= 3)
    # regularize: C <- V diag(eps,1,1) V^T (ascending eigvals)
    vals, vecs = linalg3.eigh3(cov)
    reg = jnp.array([PLANE_EPS, 1.0, 1.0], dtype=points.dtype)
    cov_reg = jnp.einsum(
        "nij,j,nkj->nik", vecs, reg, vecs, precision="highest"
    )
    eye = jnp.eye(3, dtype=points.dtype)
    cov_reg = jnp.where(valid[:, None, None], cov_reg, eye)
    return cov_reg, valid


@functools.partial(jax.jit, static_argnames=("k", "backend", "window"))
def plane_covariances(
    points: jax.Array,
    mask: jax.Array,
    k: int = 15,
    backend: str = "grid",
    res: float = 0.3,
    window: int = 5,
    table_size: int | None = None,
):
    """Per-point GICP covariances, eigenvalues regularized to (eps, 1, 1).

    Matches Nano-GICP's calculateSourceCovariances / calculateTargetCovariances
    semantics (loop_closure.cpp:121,123) with k = correspondences_number.
    backend='grid' searches a +-(window//2) voxel neighborhood (documented
    divergence: sparse regions with <3 in-window neighbors are invalidated
    rather than reaching across the cloud like an exact kd-tree).

    Returns (covs (N,3,3), valid (N,)).
    """
    n = points.shape[0]
    if backend == "grid":
        t = table_size or max(1024, 1 << (int(n * 4 - 1)).bit_length())
        grid = hashgrid.build(points, mask, res=res, table_size=t)
        nn_pts, nn_d2, nn_valid = hashgrid.query_knn(
            grid, points, mask, k=k, window=window
        )
    else:
        nn_d2, nn_idx, nn_valid = pallas_knn.knn_pallas(points, mask, points, mask, k)
        nn_pts = points[jnp.clip(nn_idx, 0)]
    return plane_covariances_from_knn(points, mask, nn_pts, nn_valid)


class _GNState(NamedTuple):
    T: jax.Array
    it: jax.Array
    delta: jax.Array
    done: jax.Array
    num_corr: jax.Array
    H: jax.Array  # final normal-equation matrix (degeneracy diagnosis)


@functools.partial(
    jax.jit, static_argnames=("max_iter", "banded")
)
def _gicp_iterate(
    src, src_mask, src_cov, dst, dst_mask, dst_cov, init_T,
    max_corr_dist, trans_eps, max_iter, banded=False,
):
    max_d2 = max_corr_dist * max_corr_dist
    nn = pallas_knn.nn_banded if banded else pallas_knn.nn_pallas

    def body(state: _GNState) -> _GNState:
        R = state.T[:3, :3]
        y = se3.transform_points(src, state.T)  # (N,3)
        d2, idx, nn_ok = nn(y, src_mask, dst, dst_mask)
        corr = nn_ok & (d2 < max_d2)
        j = jnp.clip(idx, 0)
        dpts = dst[j]
        # M = (C_dst + R C_src R^T)^-1 per correspondence
        RCsRt = jnp.einsum(
            "ab,nbc,dc->nad", R, src_cov, R, precision="highest"
        )
        M = linalg3.inv3(dst_cov[j] + RCsRt)
        r = dpts - y  # (N,3)
        # J = [hat(y) | -I], left-multiplicative update T <- exp(xi) T
        Jw = se3.hat(y)  # (N,3,3) — d r / d w = hat(y)
        w = corr.astype(src.dtype)
        # J = [A | -I] with A = hat(y); J^T M J blocks:
        #   [A^T M A, -A^T M; -M A, M]
        MJw = jnp.einsum("nab,nbc->nac", M, Jw, precision="highest")
        Hww = jnp.einsum("nba,nbc,n->ac", Jw, MJw, w, precision="highest")
        Hwv = -jnp.einsum("nba,nbc,n->ac", Jw, M, w, precision="highest")
        Hvv = jnp.einsum("nab,n->ab", M, w, precision="highest")
        Mr = jnp.einsum("nab,nb->na", M, r, precision="highest")
        bw = jnp.einsum("nba,nb,n->a", Jw, Mr, w, precision="highest")
        bv = -jnp.einsum("na,n->a", Mr, w, precision="highest")
        H = jnp.block([[Hww, Hwv], [Hwv.T, Hvv]])
        b = jnp.concatenate([bw, bv])
        # GN step: minimize ||r + J xi||_M^2 -> H xi = -b
        xi = linalg3.solve6(H, -b, damping=1e-6)
        T_new = se3.compose(se3.se3_exp(xi), state.T)
        delta = jnp.linalg.norm(xi)
        done = delta < trans_eps
        return _GNState(T_new, state.it + 1, delta, done,
                        jnp.sum(corr).astype(jnp.int32), H)

    def cond(state: _GNState):
        return (state.it < max_iter) & (~state.done)

    st0 = _GNState(
        init_T, jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False),
        jnp.int32(0), jnp.eye(6, dtype=src.dtype),
    )
    st = jax.lax.while_loop(cond, body, st0)
    return st


@functools.partial(jax.jit, static_argnames=("banded",))
def fitness_score(src, src_mask, dst, dst_mask, T, banded=False):
    """PCL Registration::getFitnessScore with default max_range: mean squared
    distance from each (valid) transformed src point to its dst NN.
    banded=True uses the bbox-pruned kernel (clouds should be
    morton-sorted — see pallas_knn.knn_banded)."""
    y = se3.transform_points(src, T)
    nn = pallas_knn.nn_banded if banded else pallas_knn.nn_pallas
    d2, idx, ok = nn(y, src_mask, dst, dst_mask)
    w = (ok & src_mask).astype(src.dtype)
    return jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0)


def align(
    src: jax.Array,
    src_mask: jax.Array,
    dst: jax.Array,
    dst_mask: jax.Array,
    init_T: jax.Array | None = None,
    *,
    k: int = 15,
    max_iter: int = 32,
    max_corr_dist: float = 52.5,
    trans_eps: float = 0.01,
    cov_backend: str = "grid",
    voxel_res: float = 0.3,
    src_cov: tuple[jax.Array, jax.Array] | None = None,
    dst_cov: tuple[jax.Array, jax.Array] | None = None,
    banded: bool = True,
) -> GicpResult:
    """Full Nano-GICP-equivalent alignment: covariances + GN + fitness.

    Defaults mirror the reference's effective config: k=15, max_iter=32,
    max_corr_dist = loop_detection_radius*1.5 = 52.5 (fast_lio_sam_qn.cpp:24),
    transformation_epsilon = 0.01 (config.yaml:24).

    src_cov / dst_cov: optional precomputed (covs (N,3,3), valid (N,))
    pairs — e.g. derived from a kNN pass an earlier stage already ran
    (plane_covariances_from_knn); skips the internal covariance search.

    banded=True (TPU): morton-sorts both clouds once and runs every
    per-iteration NN + the fitness NN through the bbox-pruned kernel
    (pallas_knn.knn_banded) — the sort is rigid-transform friendly, so one
    src sort keeps query blocks compact across all GN iterations. All
    outputs are permutation-independent (the einsum reductions change fp
    summation order only). Set False under vmap (spmd.batched_gicp_align)
    where the pruned kernel's SMEM bbox operand is not batch-tested.
    """
    if init_T is None:
        init_T = jnp.eye(4, dtype=src.dtype)
    if src_cov is None:
        src_cov = plane_covariances(
            src, src_mask, k=k, backend=cov_backend, res=voxel_res
        )
    if dst_cov is None:
        dst_cov = plane_covariances(
            dst, dst_mask, k=k, backend=cov_backend, res=voxel_res
        )
    src_cov, src_ok = src_cov
    dst_cov, dst_ok = dst_cov
    banded = bool(banded and pallas_knn.on_tpu()
                  and dst.shape[0] <= pallas_knn.MAX_DB)
    if banded:
        so = pallas_knn.morton_order(src, src_mask)
        do = pallas_knn.morton_order(dst, dst_mask)
        src, src_mask, src_cov, src_ok = (
            src[so], src_mask[so], src_cov[so], src_ok[so])
        dst, dst_mask, dst_cov, dst_ok = (
            dst[do], dst_mask[do], dst_cov[do], dst_ok[do])
    st = _gicp_iterate(
        src, src_mask & src_ok, src_cov, dst, dst_mask & dst_ok, dst_cov,
        init_T, max_corr_dist, trans_eps, max_iter, banded=banded,
    )
    fit = fitness_score(src, src_mask, dst, dst_mask, st.T, banded=banded)
    # PCL-style: converged_ true once the optimization ran; acceptance is
    # gated by the fitness threshold upstream (loop_closure.cpp:129).
    # Degeneracy: planar scenes leave translation directions unconstrained
    # (sliding along a wall keeps point-to-plane fitness ~0, producing
    # confidently-wrong loop measurements); flag when the translation
    # block of the normal equations is ill-conditioned per correspondence.
    Hvv = st.H[3:, 3:] / jnp.maximum(st.num_corr.astype(src.dtype), 1.0)
    tvals, _ = linalg3.eigh3(Hvv[None])
    # conservative threshold: only flag truly unconstrained directions
    # (sparse long-range scans are legitimately anisotropic; an aggressive
    # gate rejected nearly all true loops in stress tests)
    degenerate = tvals[0, 0] < 1e-5 * tvals[0, 2]
    converged = st.num_corr > 0
    return GicpResult(st.T, fit, converged, st.it, st.num_corr, degenerate)
