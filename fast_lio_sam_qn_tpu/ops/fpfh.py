"""FPFH (Fast Point Feature Histograms) — fixed-shape, masked, batched.

Feature front end of the Quatro-equivalent global registration (the
reference constructs quatro<PointType> with fpfh_normal_radius=0.9 and
fpfh_radius=1.5, loop_closure.cpp:18-27 / config.yaml:35-36; upstream Quatro
computes PCL FPFH [external]).

Pipeline (all jitted, static shapes):
1. normals: PCA over the K_N nearest neighbors within normal_radius
   (exact brute-force kNN — the MXU eats the distance matrix; neighbors
   outside the radius are masked),
2. SPFH: for each point, Darboux-frame angle triplets (alpha, phi, theta)
   against its K_F in-radius neighbors, histogrammed into 3 x 11 bins by
   one-hot summation (a matmul-shaped reduction, MXU-friendly),
3. FPFH: SPFH(p) + sum_q SPFH(q)/(K * dist(p,q)) over the same neighbors,
   each 11-bin block normalized to sum 100 (PCL convention).

Divergence from PCL: radius neighbor sets are capped at K_N/K_F nearest
(PCL is unbounded); dense urban clouds voxelized at 0.3 m rarely exceed the
caps within 0.9/1.5 m radii.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import pallas_knn

FPFH_DIM = 33
_NBINS = 11


def _normals_from_knn(points, mask, nd2, nidx, nvalid, radius, viewpoint):
    """PCA normals from precomputed kNN, radius-masked, viewpoint-oriented.

    Shared by estimate_normals and fpfh (the orientation convention here was
    a hard-won fix — orient-toward-cloud-centroid flipped 24% of normals
    between two scans of the same scene — so it must live in ONE place).
    Returns (normals (N,3), valid (N,))."""
    from . import linalg3

    if viewpoint is None:
        viewpoint = jnp.sum(points * mask[:, None], 0) / jnp.maximum(
            jnp.sum(mask), 1.0)
    in_r = nvalid & (nd2 <= radius * radius)
    npts = points[jnp.clip(nidx, 0)]
    w = in_r.astype(points.dtype)
    cnt = jnp.sum(w, -1)
    mean = jnp.sum(npts * w[..., None], -2) / jnp.maximum(cnt, 1.0)[..., None]
    d = (npts - mean[..., None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d, precision="highest")
    vals, vecs = linalg3.eigh3(cov)
    n = vecs[..., :, 0]
    to_view = viewpoint[None, :] - points
    sign = jnp.where(jnp.sum(n * to_view, -1, keepdims=True) < 0, -1.0, 1.0)
    n = n * sign
    valid = mask & (cnt >= 3)
    return jnp.where(valid[:, None], n, 0.0), valid


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points, mask, radius: jax.Array, k: int = 32,
                     viewpoint: jax.Array | None = None):
    """PCA normals from <=k nearest neighbors within `radius`.

    Returns (normals (N,3) unit, valid (N,)). Normal sign is oriented toward
    `viewpoint` (the sensor/keyframe origin — PCL convention); see
    _normals_from_knn."""
    d2, idx, v = pallas_knn.knn_pallas(points, mask, points, mask, k)
    return _normals_from_knn(points, mask, d2, idx, v, radius, viewpoint)


@jax.jit
def distinctive(desc: jax.Array, valid: jax.Array,
                planarity_threshold: jax.Array = 90.0) -> jax.Array:
    """Filter out degenerate (planar) descriptors before matching.

    A flat-surface FPFH concentrates ~all mass in one bin per 11-bin block;
    thousands of such identical descriptors make nearest-neighbor matching a
    pure lottery (measured: ~1% true-match rate unfiltered vs ~19% filtered
    on simulated loop pairs).  Keeps points whose mean per-block max mass is
    below the threshold (blocks sum to 100)."""
    mx = jnp.stack(
        [jnp.max(desc[:, s:s + _NBINS], axis=-1)
         for s in range(0, FPFH_DIM, _NBINS)], axis=-1)
    return valid & (jnp.mean(mx, axis=-1) < planarity_threshold)


def _pair_features(p, n_p, q, n_q):
    """PFH angle triplet for point pair (p -> q). All (..., 3)."""
    dvec = q - p
    dist = jnp.linalg.norm(dvec, axis=-1)
    dn = dvec / jnp.maximum(dist[..., None], 1e-9)
    u = n_p
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n_q, -1)                      # [-1, 1]
    phi = jnp.sum(u * dn, -1)                         # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, -1), jnp.sum(u * n_q, -1))  # [-pi,pi]
    return alpha, phi, theta, dist


def _hist11(vals, lo, hi, w):
    """One-hot histogram over 11 bins; vals (...,K), weights w (...,K) ->
    (..., 11)."""
    b = jnp.clip(((vals - lo) / (hi - lo) * _NBINS).astype(jnp.int32), 0,
                 _NBINS - 1)
    onehot = jax.nn.one_hot(b, _NBINS, dtype=vals.dtype)
    return jnp.sum(onehot * w[..., None], axis=-2)


@functools.partial(jax.jit, static_argnames=("k_feat", "k_normal",
                                              "return_knn"))
def fpfh(
    points: jax.Array,
    mask: jax.Array,
    normal_radius: jax.Array,
    feature_radius: jax.Array,
    k_feat: int = 48,
    k_normal: int = 32,
    viewpoint: jax.Array | None = None,
    return_knn: bool = False,
):
    """Full FPFH descriptor. Returns (desc (N,33), valid (N,)); with
    return_knn=True additionally the shared kNN triplet (d2, idx, valid)
    of shape (N, max(k_feat, k_normal)) so callers can reuse it (GICP
    plane covariances need the same neighbor sets — kNN indices are
    invariant under the rigid transforms between the stages).

    `viewpoint` (sensor/keyframe origin) orients the normals; pass it
    whenever known — see estimate_normals.

    One shared kNN pass (k = max(k_feat, k_normal)) feeds both the normal
    estimation (first k_normal neighbors, radius-masked) and the SPFH
    neighborhoods — the kNN kernel is the dominant cost and running it
    twice over the same cloud is pure waste."""
    k_all = max(k_feat, k_normal)
    d2_all, idx_all, v_all = pallas_knn.knn_pallas(points, mask, points,
                                                   mask, k_all)
    # ---- normals from the nearest k_normal within normal_radius ----
    normals, n_valid = _normals_from_knn(
        points, mask, d2_all[:, :k_normal], idx_all[:, :k_normal],
        v_all[:, :k_normal], normal_radius, viewpoint)
    m = mask & n_valid

    d2 = d2_all[:, :k_feat]
    idx = idx_all[:, :k_feat]
    # neighbor validity additionally requires the NEIGHBOR to have a valid
    # normal (the separate-kNN version searched within the m-masked set)
    v = v_all[:, :k_feat] & n_valid[jnp.clip(idx, 0)] & m[:, None]
    idx_c = jnp.clip(idx, 0)
    in_r = v & (d2 <= feature_radius * feature_radius) & (d2 > 1e-12)
    q = points[idx_c]          # (N,K,3)
    n_q = normals[idx_c]
    p = points[:, None, :]
    n_p = normals[:, None, :]
    alpha, phi, theta, dist = _pair_features(p, n_p, q, n_q)
    w = in_r.astype(points.dtype)

    spfh = jnp.concatenate(
        [
            _hist11(alpha, -1.0, 1.0, w),
            _hist11(phi, -1.0, 1.0, w),
            _hist11(theta, -jnp.pi, jnp.pi, w),
        ],
        axis=-1,
    )  # (N, 33)
    cnt = jnp.maximum(jnp.sum(w, -1), 1.0)
    spfh = spfh / cnt[..., None]  # normalized SPFH

    # FPFH(p) = SPFH(p) + (1/K) sum_q SPFH(q) / dist(p, q)
    inv_d = w / jnp.maximum(dist, 1e-6)
    neigh = spfh[idx_c] * inv_d[..., None]  # (N,K,33)
    fp = spfh + jnp.sum(neigh, -2) / cnt[..., None]
    # PCL normalizes each 11-bin block to sum 100
    out = []
    for s in range(0, FPFH_DIM, _NBINS):
        blk = fp[:, s:s + _NBINS]
        out.append(100.0 * blk / jnp.maximum(
            jnp.sum(blk, -1, keepdims=True), 1e-9))
    desc = jnp.concatenate(out, axis=-1)
    valid = m & (jnp.sum(w, -1) >= 3)
    desc = jnp.where(valid[:, None], desc, 0.0)
    if return_knn:
        return desc, valid, (d2_all, idx_all, v_all)
    return desc, valid
