"""Streaming radius-FPFH — Pallas TPU kernels with no gathers and no kNN.

The FPFH front end of the Quatro-equivalent registration (upstream Quatro
computes PCL FPFH with radius searches; the reference configures
fpfh_normal_radius=0.9 / fpfh_radius=1.5,
/root/reference/fast_lio_sam_qn/src/loop_closure.cpp:18-27).  The kNN-based
implementation (ops/fpfh.py) approximates PCL's unbounded radius sets with
k-capped neighbor lists and pays for it twice: a k-extraction pass over
every database tile, then (N, K, 33) HBM gathers of neighbor descriptors.

This module instead streams database tiles through VMEM three times and
never materializes a neighbor list at all — *radius* weights make every
stage a dense masked reduction over the (query-block x db-tile) pair
matrix, exactly PCL's radius semantics:

1. ``moments``: per-point count / first / second moments inside the normal
   radius, accumulated as ONE MXU matmul ``W @ [1 | q | qq^T]`` of the
   (TQ, TD) in-radius mask against per-tile coordinate features.  Normals
   (smallest-eigenvector via closed-form eigh3) AND Nano-GICP's regularized
   plane covariances both fall out of the same moments — the GICP
   covariance stage disappears entirely.
2. ``spfh``: Darboux angle triplets computed per pair directly from the
   broadcast coordinates/normals (VPU), histogrammed into 3x11 bins by 33
   masked row-reductions.
3. ``fpfh``: the neighbor-descriptor aggregation
   ``FPFH(p) = SPFH(p) + (1/cnt) sum_q SPFH(q)/d(p,q)`` becomes ONE MXU
   matmul per tile: ``(w/d) @ SPFH_tile`` — the (N, K, 33) gather of the
   kNN formulation, which dominated its post-kNN cost, is gone.

Non-TPU backends fall back to an XLA formulation of the same math
(lax.map over query blocks); parity is asserted in tests (interpret mode)
and bench.py (real chip).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import linalg3
from .pallas_knn import (morton_order as _morton_order,  # shared locality sort
                         on_tpu as _pallas_on_tpu)

FPFH_DIM = 33
_NBINS = 11
_BIG = 3.4e38
TQ = 128      # query rows per grid step (TQxTD f32 temporaries in VMEM)
TD = 512      # default db columns per inner tile (see fpfh_radius's td)
PLANE_EPS = 1e-3  # gicp.PLANE_EPS (kept local to avoid an import cycle)
def _tile_bboxes(points_sorted, valid_sorted, n_pad, td):
    """(8, n_tiles) per-db-tile bounds [minx miny minz maxx maxy maxz 0 0],
    masked points excluded (+-inf neutral). Shared with the banded kNN."""
    from .pallas_knn import _tile_bboxes as shared
    return shared(points_sorted, valid_sorted, n_pad, td)


def _block_bbox(qT, qv):
    """Scalar (min, max) per axis of the VALID queries in this block."""
    v = qv > 0.0
    lo = [jnp.min(jnp.where(v, qT[i:i + 1, :], jnp.inf)) for i in range(3)]
    hi = [jnp.max(jnp.where(v, qT[i:i + 1, :], -jnp.inf)) for i in range(3)]
    return lo, hi


def _tile_overlaps(bbox_ref, t, lo, hi, r2: float):
    """Does db tile t's bbox come within radius of the block bbox?"""
    g2 = jnp.float32(0.0)
    for i in range(3):
        gap = jnp.maximum(jnp.maximum(bbox_ref[i, t] - hi[i],
                                      lo[i] - bbox_ref[3 + i, t]), 0.0)
        g2 = g2 + gap * gap
    return g2 <= r2


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pair_d2(qT, qq, db_t, dd_t):
    """Squared distances (TQ, TD) for one db tile: ||q||^2 - 2 q.v + ||v||^2
    (+BIG on masked-out db columns via dd).

    precision=HIGHEST is load-bearing: the MXU's default bf16 operand
    passes put O(1) absolute error on d2 at world-coordinate magnitudes,
    which corrupts radius membership and NN picks (see ops/pallas_knn.py)."""
    cross = jax.lax.dot_general(
        qT, db_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(qq) - 2.0 * cross + dd_t


def _moments_kernel(n_db: int, td: int, r2a: float, r2b: float):
    """Count/first/second moments at TWO radii per query (20 output cols):
    cols 0-9 for r2a (normal estimation), 10-19 for r2b (Nano-GICP plane
    covariances — a tighter, k=15-scale neighborhood; 0.9 m covariances
    over-smooth the planes and open a point-to-plane slide valley in the
    GICP fine stage).  One shared d2 block, two mask matmuls.

    The same kernel serves the batched lowering: batch is flattened into
    the operands' row axes by the index maps alone (_stream_caller), so
    every ref stays 2-D — Mosaic miscompiles these kernels when blocks
    carry a leading singleton axis (chip-measured,
    tools/prove_vmap_kernels.py)."""
    n_tiles = n_db // td
    r2max = max(r2a, r2b)

    def kernel(qT_ref, qq_ref, qv_ref, dbT_ref, dd_ref, bbox_ref, out_ref):
        qq = qq_ref[...]  # (1, TQ)
        lo, hi = _block_bbox(qT_ref[...], qv_ref[...])

        def compute(t, acc):
            db_t = dbT_ref[:, pl.ds(t * td, td)]          # (3, TD)
            dd_t = dd_ref[:, pl.ds(t * td, td)]           # (1, TD)
            d2 = _pair_d2(qT_ref[...], qq, db_t, dd_t)
            vx, vy, vz = db_t[0:1, :], db_t[1:2, :], db_t[2:3, :]
            # feature rows: [1, x, y, z, xx, xy, xz, yy, yz, zz] (10, TD)
            feats = jnp.concatenate([
                jnp.ones_like(vx), db_t, vx * db_t,
                vy * db_t[1:3, :], vz * db_t[2:3, :]], axis=0)
            out = []
            for r2 in (r2a, r2b):
                w = (d2 <= r2).astype(jnp.float32)        # (TQ, TD)
                # HIGHEST: bf16 passes would round the xx~O(100) feature
                # rows, and the covariance E[xx]-mean^2 cancellation
                # amplifies that to O(1) relative error on the planes
                out.append(jax.lax.dot_general(
                    w, feats, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))  # (TQ, 10)
            return acc + jnp.concatenate(out, axis=1)

        def tile(t, acc):
            # bbox prune: tiles beyond the radius contribute exactly zero
            return jax.lax.cond(
                _tile_overlaps(bbox_ref, t, lo, hi, r2max),
                lambda a: compute(t, a), lambda a: a, acc)

        out_ref[...] = jax.lax.fori_loop(
            0, n_tiles, tile, jnp.zeros((TQ, 20), jnp.float32))

    return kernel


def _angles(px, py, pz, ux, uy, uz, db_t, dbn_t, d2):
    """Darboux (alpha, phi, theta) for a (TQ, TD) pair block.
    p*/u* are (TQ, 1) query coords/normals; db_t/dbn_t are (3, TD) rows."""
    vx_, vy_, vz_ = db_t[0:1, :], db_t[1:2, :], db_t[2:3, :]
    nqx, nqy, nqz = dbn_t[0:1, :], dbn_t[1:2, :], dbn_t[2:3, :]
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
    dx = (vx_ - px) * inv_d
    dy = (vy_ - py) * inv_d
    dz = (vz_ - pz) * inv_d
    # v = cross(dn, u), normalized
    cvx = dy * uz - dz * uy
    cvy = dz * ux - dx * uz
    cvz = dx * uy - dy * ux
    cvn = jax.lax.rsqrt(jnp.maximum(cvx * cvx + cvy * cvy + cvz * cvz,
                                    1e-18))
    cvx, cvy, cvz = cvx * cvn, cvy * cvn, cvz * cvn
    # w = cross(u, v)
    cwx = uy * cvz - uz * cvy
    cwy = uz * cvx - ux * cvz
    cwz = ux * cvy - uy * cvx
    alpha = cvx * nqx + cvy * nqy + cvz * nqz
    phi = ux * dx + uy * dy + uz * dz
    # theta = atan2(ty, tx); returned as components — Mosaic has no atan2
    # lowering, and the histogram only needs theta's BIN, which half-plane
    # sign tests recover without any transcendental (_hist33)
    ty = cwx * nqx + cwy * nqy + cwz * nqz
    tx = ux * nqx + uy * nqy + uz * nqz
    return alpha, phi, ty, tx


import math as _math

# theta bin edges theta_j = -pi + j*2pi/11 as (cos, sin) pairs; the angle of
# (tx, ty) lies in [theta_j, theta_{j+1}) iff sigma_j >= 0 > sigma_{j+1}
# where sigma_j = ty*cos(theta_j) - tx*sin(theta_j) (bin width < pi makes
# the two half-plane tests exact) — atan2-free binning, identical edges to
# the clip((theta+pi)/2pi*11) formulation up to the theta=pi wrap point
_TH_COS = tuple(_math.cos(-_math.pi + j * 2 * _math.pi / _NBINS)
                for j in range(_NBINS + 1))
_TH_SIN = tuple(_math.sin(-_math.pi + j * 2 * _math.pi / _NBINS)
                for j in range(_NBINS + 1))


def _hist33(alpha, phi, ty, tx, w):
    """3x11-bin histogram block + count column: (TQ, 34) from (TQ, TD)
    angle/weight matrices via 33 masked row-reductions."""
    cols = []
    for vals, lo, hi in ((alpha, -1.0, 1.0), (phi, -1.0, 1.0)):
        b = jnp.clip(((vals - lo) * (_NBINS / (hi - lo))).astype(jnp.int32),
                     0, _NBINS - 1)
        for j in range(_NBINS):
            cols.append(jnp.sum(jnp.where(b == j, w, 0.0), axis=1,
                                keepdims=True))
    # degenerate (0, 0) would fall into no bin; nudge tx so it lands in the
    # theta=0 bin like atan2(0, 0) = 0 does
    tx = tx + 1e-20
    sig = [ty * _TH_COS[j] - tx * _TH_SIN[j] for j in range(_NBINS + 1)]
    for j in range(_NBINS):
        m = (sig[j] >= 0.0) & (sig[j + 1] < 0.0)
        cols.append(jnp.sum(jnp.where(m, w, 0.0), axis=1, keepdims=True))
    cols.append(jnp.sum(w, axis=1, keepdims=True))
    return jnp.concatenate(cols, axis=1)


def _not_self(qidx, t, td):
    """(TQ, TD) mask of pairs that are NOT the query itself (qidx: (1, TQ)
    global query row indices).

    The self pair must be excluded by INDEX, not by a d2 threshold: the
    d2 = qq - 2q.v + vv formulation leaves ~1e-5 cancellation residue on
    the diagonal, so a threshold test flips per-platform (interpret-mode
    parity caught a 1/d-weighted self term leaking in on one side)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, td), 1) + t * td
    return jnp.transpose(qidx) != col


def _spfh_kernel(n_db: int, td: int, r2: float):
    n_tiles = n_db // td

    def kernel(qT_ref, qq_ref, qv_ref, qidx_ref, qnT_ref, dbT_ref,
               dbnT_ref, dd_ref, bbox_ref, out_ref):
        qq = qq_ref[...]
        qidx = qidx_ref[...]
        lo, hi = _block_bbox(qT_ref[...], qv_ref[...])
        px = jnp.transpose(qT_ref[0:1, :])
        py = jnp.transpose(qT_ref[1:2, :])
        pz = jnp.transpose(qT_ref[2:3, :])
        ux = jnp.transpose(qnT_ref[0:1, :])
        uy = jnp.transpose(qnT_ref[1:2, :])
        uz = jnp.transpose(qnT_ref[2:3, :])

        def compute(t, acc):
            db_t = dbT_ref[:, pl.ds(t * td, td)]
            dbn_t = dbnT_ref[:, pl.ds(t * td, td)]
            dd_t = dd_ref[:, pl.ds(t * td, td)]
            d2 = _pair_d2(qT_ref[...], qq, db_t, dd_t)
            w = ((d2 <= r2) & _not_self(qidx, t, td)).astype(jnp.float32)
            alpha, phi, ty, tx = _angles(px, py, pz, ux, uy, uz,
                                         db_t, dbn_t, d2)
            return acc + _hist33(alpha, phi, ty, tx, w)

        def tile(t, acc):
            return jax.lax.cond(
                _tile_overlaps(bbox_ref, t, lo, hi, r2),
                lambda a: compute(t, a), lambda a: a, acc)

        out_ref[...] = jax.lax.fori_loop(
            0, n_tiles, tile, jnp.zeros((TQ, FPFH_DIM + 1), jnp.float32))

    return kernel


def _fpfh_agg_kernel(n_db: int, td: int, r2: float):
    n_tiles = n_db // td

    def kernel(qT_ref, qq_ref, qv_ref, qidx_ref, dbT_ref, dd_ref,
               spfhT_ref, bbox_ref, out_ref):
        qq = qq_ref[...]
        qidx = qidx_ref[...]
        lo, hi = _block_bbox(qT_ref[...], qv_ref[...])

        def compute(t, acc):
            db_t = dbT_ref[:, pl.ds(t * td, td)]
            dd_t = dd_ref[:, pl.ds(t * td, td)]
            # SPFH arrives TRANSPOSED (33, Np) so each tile slices the
            # 128-lane axis — a (TD, 33) row-slice forces a per-tile
            # relayout that measured 12 ms/cloud on its own
            s_t = spfhT_ref[:, pl.ds(t * td, td)]         # (33, TD)
            d2 = _pair_d2(qT_ref[...], qq, db_t, dd_t)
            in_r = (d2 <= r2) & _not_self(qidx, t, td)
            # 1e-6 m floor caps duplicate-point weights (matches the kNN
            # formulation's max(dist, 1e-6))
            w = jnp.where(in_r, jax.lax.rsqrt(jnp.maximum(d2, 1e-12)), 0.0)
            # default precision is deliberate (unlike d2 and the moment
            # features, descriptor accumulation has no cancellation —
            # bf16 operand rounding is ~0.4% on histogram mass, far below
            # the match-relevant descriptor differences)
            agg = jax.lax.dot_general(
                w, s_t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (TQ, 33)
            cnt = jnp.sum(in_r.astype(jnp.float32), axis=1, keepdims=True)
            return acc + jnp.concatenate([agg, cnt], axis=1)

        def tile(t, acc):
            return jax.lax.cond(
                _tile_overlaps(bbox_ref, t, lo, hi, r2),
                lambda a: compute(t, a), lambda a: a, acc)

        out_ref[...] = jax.lax.fori_loop(
            0, n_tiles, tile, jnp.zeros((TQ, FPFH_DIM + 1), jnp.float32))

    return kernel


# ---------------------------------------------------------------------------
# host-side drivers
# ---------------------------------------------------------------------------

def _pad_db(points, penalty, td):
    n = points.shape[0]
    n_pad = -(-n // td) * td
    dbT = jnp.pad(points, ((0, n_pad - n), (0, 0))).T          # (3, Np)
    dd = jnp.pad(jnp.sum(points * points, -1) + penalty,
                 (0, n_pad - n), constant_values=_BIG)[None, :]
    return dbT, dd, n_pad


def _pad_q(arr, m_pad):
    return jnp.pad(arr, ((0, m_pad - arr.shape[0]), (0, 0)))


def _dbspec(rows, n_pad):
    return pl.BlockSpec((rows, n_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _bbox_spec(n_pad, td):
    return pl.BlockSpec((8, n_pad // td), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)


def _qv_row(mask, m_pad):
    return jnp.pad(mask.astype(jnp.float32), (0, m_pad - mask.shape[0])
                   )[None, :]


# operand signatures per kernel: 'q' = query-blocked (rows, TQ) slices,
# 'db' = full db-resident (rows, n_pad), 'bbox' = the (8, n_tiles) SMEM
# table.  Shared by the unbatched and grid-batched pallas_call builders.
_KERNELS = {
    "moments": (_moments_kernel, 20,
                (("q", 3), ("q", 1), ("q", 1), ("db", 3), ("db", 1),
                 ("bbox",))),
    "spfh": (_spfh_kernel, FPFH_DIM + 1,
             (("q", 3), ("q", 1), ("q", 1), ("q", 1), ("q", 3), ("db", 3),
              ("db", 3), ("db", 1), ("bbox",))),
    "agg": (_fpfh_agg_kernel, FPFH_DIM + 1,
            (("q", 3), ("q", 1), ("q", 1), ("q", 1), ("db", 3), ("db", 1),
             ("db", FPFH_DIM), ("bbox",))),
}


@functools.lru_cache(maxsize=None)
def _stream_caller(which: str, r_args: tuple, td: int, interpret: bool):
    """custom_vmap entry for one streaming kernel's pallas_call: unbatched
    calls run the plain kernel; under jax.vmap the rule dispatches to the
    natively GRID-BATCHED kernel (batch = leading grid dim) instead of
    letting Mosaic batch the SMEM-operand kernel — that vmapped lowering
    is chip-DISPROVEN (tools/prove_vmap_kernels.py, models/loop_closure.py).
    Cached per static config so the custom_vmap object is reused."""
    factory, n_out, sig = _KERNELS[which]

    @jax.custom_batching.custom_vmap
    def call(*ops):
        mp = ops[0].shape[1]
        n_pad = next(o for o, s in zip(ops, sig) if s[0] == "db").shape[1]
        in_specs = []
        for s in sig:
            if s[0] == "q":
                in_specs.append(pl.BlockSpec(
                    (s[1], TQ), lambda i: (0, i), memory_space=pltpu.VMEM))
            elif s[0] == "db":
                in_specs.append(_dbspec(s[1], n_pad))
            else:
                in_specs.append(_bbox_spec(n_pad, td))
        return pl.pallas_call(
            factory(n_pad, td, *r_args),
            grid=(mp // TQ,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TQ, n_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, n_out), jnp.float32),
            interpret=interpret,
        )(*ops)

    @call.def_vmap
    def _batched_rule(axis_size, in_batched, *ops):
        ops = [o if b else jnp.broadcast_to(o, (axis_size,) + o.shape)
               for o, b in zip(ops, in_batched)]
        mp = ops[0].shape[2]
        n_pad = next(o for o, s in zip(ops, sig) if s[0] == "db").shape[2]
        nblk = mp // TQ
        # Batch is carried purely by the index maps so every ref stays 2-D
        # and the kernel body is the exact chip-proven single-cloud kernel
        # (Mosaic miscompiles these kernels when blocks carry a leading
        # singleton axis — chip-measured, tools/prove_vmap_kernels.py).
        # Mosaic's block rule (sublane dim divisible by 8 or equal to the
        # array dim) forces the layout per operand: wide VMEM operands are
        # LANE-flattened ((B, r, n) -> (r, B*n), block sublane r == array
        # dim r), the output is ROW-flattened (block sublane TQ % 8 == 0),
        # and the SMEM bbox table's 8 rows satisfy the rule row-flattened.
        in_specs = []
        flat = []
        for o, s in zip(ops, sig):
            if s[0] == "q":
                in_specs.append(pl.BlockSpec(
                    (s[1], TQ), lambda b, i: (0, b * nblk + i),
                    memory_space=pltpu.VMEM))
                flat.append(jnp.transpose(o, (1, 0, 2)).reshape(
                    s[1], axis_size * mp))
            elif s[0] == "db":
                in_specs.append(pl.BlockSpec(
                    (s[1], n_pad), lambda b, i: (0, b),
                    memory_space=pltpu.VMEM))
                flat.append(jnp.transpose(o, (1, 0, 2)).reshape(
                    s[1], axis_size * n_pad))
            else:
                in_specs.append(pl.BlockSpec(
                    (8, n_pad // td), lambda b, i: (b, 0),
                    memory_space=pltpu.SMEM))
                flat.append(o.reshape(axis_size * 8, n_pad // td))
        out = pl.pallas_call(
            factory(n_pad, td, *r_args),
            grid=(axis_size, nblk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TQ, n_out),
                                   lambda b, i: (b * nblk + i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((axis_size * mp, n_out),
                                           jnp.float32),
            interpret=interpret,
        )(*flat)
        return out.reshape(axis_size, mp, n_out), True

    return call


def _moments_tpu(points, mask, radius: float, cov_radius: float,
                 interpret: bool = False, td: int = TD):
    m = points.shape[0]
    penalty = jnp.where(mask, 0.0, _BIG)
    dbT, dd, n_pad = _pad_db(points, penalty, td)
    bbox = _tile_bboxes(points, mask, n_pad, td)
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    out = _stream_caller(
        "moments", (radius * radius, cov_radius * cov_radius), td, interpret
    )(q.T, jnp.sum(q * q, -1)[None, :], _qv_row(mask, m_pad), dbT, dd, bbox)
    return out[:m]


def _moments_xla(points, mask, radius: float, cov_radius: float = None):
    """XLA fallback: identical math, lax.map over query blocks.  Returns
    (N, 10) for a single radius, (N, 20) when cov_radius is given."""
    m = points.shape[0]
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    dd = jnp.sum(points * points, -1) + jnp.where(mask, 0.0, _BIG)
    feats = jnp.concatenate(
        [jnp.ones((points.shape[0], 1), points.dtype), points,
         points[:, 0:1] * points, points[:, 1:2] * points[:, 1:],
         points[:, 2:3] * points[:, 2:]], axis=1)        # (N, 10)
    radii = [radius] if cov_radius is None else [radius, cov_radius]
    ncol = 10 * len(radii)

    def block(qb):
        cross = jnp.matmul(qb, points.T, precision="highest")
        d2 = jnp.sum(qb * qb, -1)[:, None] - 2.0 * cross + dd[None, :]
        return jnp.concatenate(
            [jnp.matmul((d2 <= r * r).astype(points.dtype), feats,
              precision="highest") for r in radii], -1)

    out = jax.lax.map(block, q.reshape(-1, TQ, 3)).reshape(m_pad, ncol)
    return out[:m]


def _mom_comps(mom10):
    """(N, 10) moment columns -> (cnt, mean (N,3), 6 covariance component
    arrays (N,)) — struct-of-arrays so eigh3_soa gets lane-efficient
    inputs."""
    cnt = mom10[:, 0]
    safe = jnp.maximum(cnt, 1.0)
    mean = mom10[:, 1:4] / safe[:, None]
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    c00 = mom10[:, 4] / safe - mx * mx
    c01 = mom10[:, 5] / safe - mx * my
    c02 = mom10[:, 6] / safe - mx * mz
    c11 = mom10[:, 7] / safe - my * my
    c12 = mom10[:, 8] / safe - my * mz
    c22 = mom10[:, 9] / safe - mz * mz
    return cnt, mean, (c00, c01, c02, c11, c12, c22)


def moments_to_normals_covs(mom, points, mask, viewpoint):
    """(N, 10|20) radius moments -> (normals, n_valid, cov_reg, mean).

    Normals: smallest eigenvector of the first moment block,
    viewpoint-oriented (PCL convention, shared with
    ops/fpfh._normals_from_knn).  cov_reg: Nano-GICP regularized plane
    covariance V diag(eps,1,1) V^T (gicp.plane_covariances_from_knn:60-68
    semantics) — from the SECOND (tighter, cov_radius) moment block when
    present, else from the same block as the normals.  Points whose
    cov-radius neighborhood is too small get an identity covariance
    (point-to-point behavior) but keep their normal validity.

    Everything runs in struct-of-arrays form (linalg3.eigh3_soa): the
    (N, 3, 3) formulation put the batch on sublanes and measured 14.5 ms
    per eigendecomposition on v5e; this path is ~0.2 ms."""
    cnt, mean, comps = _mom_comps(mom[:, :10])
    _, evecs = linalg3.eigh3_soa(*comps)
    n = jnp.stack([evecs[0][0], evecs[1][0], evecs[2][0]], axis=-1)
    if viewpoint is None:
        viewpoint = jnp.sum(points * mask[:, None], 0) / jnp.maximum(
            jnp.sum(mask), 1.0)
    to_view = viewpoint[None, :] - points
    n = n * jnp.where(jnp.sum(n * to_view, -1, keepdims=True) < 0, -1.0, 1.0)
    n_valid = mask & (cnt >= 3)
    n = jnp.where(n_valid[:, None], n, 0.0)
    if mom.shape[1] >= 20:
        cnt_c, _, comps_c = _mom_comps(mom[:, 10:20])
        _, vc = linalg3.eigh3_soa(*comps_c)
    else:
        cnt_c, vc = cnt, evecs
    # cov_reg = eps v0 v0^T + v1 v1^T + v2 v2^T, built per component
    reg = (PLANE_EPS, 1.0, 1.0)
    cov_ok = n_valid & (cnt_c >= 3)
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            cij = sum(reg[k] * vc[i][k] * vc[j][k] for k in range(3))
            row.append(jnp.where(cov_ok, cij,
                                 jnp.float32(1.0 if i == j else 0.0)))
        rows.append(jnp.stack(row, axis=-1))
    cov_reg = jnp.stack(rows, axis=-2)
    return n, n_valid, cov_reg, mean


def _spfh_tpu(points, mask, normals, n_valid, radius: float,
              interpret: bool = False, td: int = TD):
    m = points.shape[0]
    penalty = jnp.where(mask & n_valid, 0.0, _BIG)
    dbT, dd, n_pad = _pad_db(points, penalty, td)
    dbnT = jnp.pad(normals, ((0, n_pad - m), (0, 0))).T
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    qn = _pad_q(normals, m_pad)
    qidx = jnp.arange(m_pad, dtype=jnp.int32)[None, :]
    bbox = _tile_bboxes(points, mask & n_valid, n_pad, td)
    out = _stream_caller("spfh", (radius * radius,), td, interpret)(
        q.T, jnp.sum(q * q, -1)[None, :], _qv_row(mask, m_pad), qidx, qn.T,
        dbT, dbnT, dd, bbox)
    return out[:m]


def _spfh_xla(points, mask, normals, n_valid, radius: float):
    m = points.shape[0]
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    qn = _pad_q(normals, m_pad)
    dd = jnp.sum(points * points, -1) + jnp.where(mask & n_valid, 0.0, _BIG)
    r2 = radius * radius
    dbT, dbnT = points.T, normals.T

    n = points.shape[0]

    def block(args):
        qb, qnb, i = args
        cross = jnp.matmul(qb, points.T, precision="highest")
        d2 = jnp.sum(qb * qb, -1)[:, None] - 2.0 * cross + dd[None, :]
        not_self = (i * TQ + jnp.arange(TQ))[:, None] != jnp.arange(n)[None]
        w = ((d2 <= r2) & not_self).astype(points.dtype)
        alpha, phi, ty, tx = _angles(
            qb[:, 0:1], qb[:, 1:2], qb[:, 2:3],
            qnb[:, 0:1], qnb[:, 1:2], qnb[:, 2:3], dbT, dbnT, d2)
        return _hist33(alpha, phi, ty, tx, w)

    out = jax.lax.map(block, (q.reshape(-1, TQ, 3), qn.reshape(-1, TQ, 3),
                              jnp.arange(m_pad // TQ)))
    return out.reshape(m_pad, FPFH_DIM + 1)[:m]


def _fpfh_agg_tpu(points, mask, n_valid, spfh, radius: float,
                  interpret: bool = False, td: int = TD):
    m = points.shape[0]
    penalty = jnp.where(mask & n_valid, 0.0, _BIG)
    dbT, dd, n_pad = _pad_db(points, penalty, td)
    spfhT = jnp.pad(spfh, ((0, n_pad - m), (0, 0))).T    # (33, Np)
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    qidx = jnp.arange(m_pad, dtype=jnp.int32)[None, :]
    bbox = _tile_bboxes(points, mask & n_valid, n_pad, td)
    out = _stream_caller("agg", (radius * radius,), td, interpret)(
        q.T, jnp.sum(q * q, -1)[None, :], _qv_row(mask, m_pad), qidx, dbT,
        dd, spfhT, bbox)
    return out[:m]


def _fpfh_agg_xla(points, mask, n_valid, spfh, radius: float):
    m = points.shape[0]
    m_pad = -(-m // TQ) * TQ
    q = _pad_q(points, m_pad)
    dd = jnp.sum(points * points, -1) + jnp.where(mask & n_valid, 0.0, _BIG)
    r2 = radius * radius

    n = points.shape[0]

    def block(args):
        qb, i = args
        cross = jnp.matmul(qb, points.T, precision="highest")
        d2 = jnp.sum(qb * qb, -1)[:, None] - 2.0 * cross + dd[None, :]
        not_self = (i * TQ + jnp.arange(TQ))[:, None] != jnp.arange(n)[None]
        in_r = (d2 <= r2) & not_self
        w = jnp.where(in_r, jax.lax.rsqrt(jnp.maximum(d2, 1e-12)), 0.0)
        return jnp.concatenate(
            [jnp.matmul(w, spfh, precision="highest"),
             jnp.sum(in_r, axis=1, dtype=points.dtype)[:, None]], -1)

    out = jax.lax.map(block, (q.reshape(-1, TQ, 3),
                              jnp.arange(m_pad // TQ)))
    return out.reshape(m_pad, FPFH_DIM + 1)[:m]


def on_tpu() -> bool:
    return _pallas_on_tpu()


@functools.partial(jax.jit, static_argnames=("normal_radius",
                                             "feature_radius", "cov_radius",
                                             "use_tpu", "td"))
def _fpfh_radius_impl(points, mask, normal_radius, feature_radius,
                      cov_radius, viewpoint, use_tpu: bool, td: int = TD):
    order = None
    if use_tpu:
        # spatial-locality sort: makes query blocks AND db tiles compact
        # so the kernels' bbox test prunes most pair blocks; results are
        # unsorted on return (identical values, different fp sum order)
        order = _morton_order(points, mask)
        points = points[order]
        mask = mask[order]
    mom = (functools.partial(_moments_tpu, td=td) if use_tpu
           else _moments_xla)(points, mask, normal_radius, cov_radius)
    normals, n_valid, cov_reg, _ = moments_to_normals_covs(
        mom, points, mask, viewpoint)
    raw = (functools.partial(_spfh_tpu, td=td) if use_tpu else _spfh_xla)(
        points, mask, normals, n_valid, feature_radius)
    cnt = raw[:, FPFH_DIM]
    spfh = raw[:, :FPFH_DIM] / jnp.maximum(cnt, 1.0)[:, None]
    agg = (functools.partial(_fpfh_agg_tpu, td=td) if use_tpu
           else _fpfh_agg_xla)(points, mask, n_valid, spfh, feature_radius)
    cnt_f = agg[:, FPFH_DIM]
    fp = spfh + agg[:, :FPFH_DIM] / jnp.maximum(cnt_f, 1.0)[:, None]
    blocks = []
    for s in range(0, FPFH_DIM, _NBINS):
        blk = fp[:, s:s + _NBINS]
        blocks.append(100.0 * blk / jnp.maximum(
            jnp.sum(blk, -1, keepdims=True), 1e-9))
    desc = jnp.concatenate(blocks, axis=-1)
    valid = n_valid & (cnt >= 3)
    desc = jnp.where(valid[:, None], desc, 0.0)
    if order is not None:
        inv = jnp.argsort(order)
        desc, valid = desc[inv], valid[inv]
        normals, n_valid, cov_reg = (normals[inv], n_valid[inv],
                                     cov_reg[inv])
    return desc, valid, (normals, n_valid, cov_reg)


def fpfh_radius(points, mask, normal_radius: float, feature_radius: float,
                viewpoint=None, cov_radius: float = 0.6, td: int = TD,
                use_tpu: bool | None = None):
    """Full radius-FPFH descriptor + the shared surface geometry.

    Returns (desc (N, 33), valid (N,), (normals, n_valid, cov_reg)) where
    cov_reg are Nano-GICP regularized plane covariances, computed from the
    same streamed distance blocks at `cov_radius` — callers get the GICP
    covariance stage for free.  cov_radius defaults to 0.6 m, the scale of
    Nano-GICP's k=15 neighborhoods on 0.3 m-voxelized clouds (a
    normal_radius-sized neighborhood over-smooths the planes and opens a
    point-to-plane slide valley in the fine stage).  Radii must be static
    python floats (one compile per setting).  `td` is the db tile width
    (pruning granularity) — pruned tiles cost ~nothing, so finer tiles
    remove more pair blocks (see tools/roofline.py for the sweep).
    use_tpu overrides kernel selection (None = autodetect); callers that
    vmap this (batched loop closure) pass False until the SMEM-operand
    kernels are chip-proven under vmap — the XLA path is semantically
    identical."""
    if use_tpu is None:
        use_tpu = on_tpu()
    return _fpfh_radius_impl(points, mask, float(normal_radius),
                             float(feature_radius), float(cov_radius),
                             viewpoint, bool(use_tpu), td=int(td))
