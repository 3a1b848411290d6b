"""Pallas TPU kernel for brute-force kNN — the hot op of the whole stack.

Every registration stage funnels into "for each query point, nearest (or
k-nearest) database point": GICP correspondences each GN iteration,
covariance kNN, FPFH neighborhoods, feature matching.  The XLA formulation
(ops/knn.py) materializes (chunked) distance matrices in HBM and pays an
unfused top_k; this kernel streams database tiles through VMEM, computes the
cross-term on the MXU, and maintains per-row results with iterative masked
min-extraction — the (M, N) distance matrix never exists in HBM.

Mosaic notes (see pallas_guide.md): points are passed transposed (3, N) so
the long axis is the 128-lane dimension; masks are pre-baked into additive
penalty rows; argmin uses the where(d==min, iota, BIG) trick so ties break
to the lowest index deterministically; candidate buffers are loop-carried
VALUES updated with masked selects (single-column vector stores are not
lane-aligned and Mosaic rejects them).

The public entries `nn_pallas` / `knn_pallas` fall back to the XLA path on
non-TPU backends (CPU tests run the fallback; TPU correctness is covered by
a parity check in the verify drive).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import knn as knn_xla

_BIG = 3.4e38     # python float: jnp scalars would be captured kernel consts
_IBIG = 2 ** 30
TQ = 256          # query rows per grid step
TD = 2048         # database tile (streamed through the inner loop)


def _knn_kernel(k: int, n_db: int, feat: int):
    n_tiles = n_db // TD
    kc = n_tiles * k

    def kernel(qT_ref, qq_ref, dbT_ref, dd_ref, out_d_ref, out_i_ref):
        qq = qq_ref[0, :]  # (TQ,)
        cand_col = jax.lax.broadcasted_iota(jnp.int32, (TQ, kc), 1)

        def db_tile(t, carry):
            cand_d, cand_i = carry
            db_t = dbT_ref[:, pl.ds(t * TD, TD)]      # (F, TD)
            dd_t = dd_ref[0, pl.ds(t * TD, TD)]       # (TD,)
            cross = jax.lax.dot_general(
                qT_ref[...], db_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, TD)
            d2 = qq[:, None] - 2.0 * cross + dd_t[None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TD), 1) + t * TD

            def extract(j, c2):
                d2c, cand_d, cand_i = c2
                m = jnp.min(d2c, axis=1)               # (TQ,)
                eq = d2c == m[:, None]
                am = jnp.min(jnp.where(eq, col, jnp.int32(_IBIG)), axis=1)
                sel = cand_col == (t * k + j)
                cand_d = jnp.where(sel, m[:, None], cand_d)
                cand_i = jnp.where(sel, am[:, None], cand_i)
                # knock out by INDEX (ties by value are common in symmetric
                # scenes; value-knockout would drop tied neighbors)
                d2c = jnp.where(col == am[:, None], _BIG, d2c)
                return (d2c, cand_d, cand_i)

            _, cand_d, cand_i = jax.lax.fori_loop(
                0, k, extract, (d2, cand_d, cand_i))
            return cand_d, cand_i

        cand_d0 = jnp.full((TQ, kc), _BIG, jnp.float32)
        cand_i0 = jnp.zeros((TQ, kc), jnp.int32)
        cand_d, cand_i = jax.lax.fori_loop(
            0, n_tiles, db_tile, (cand_d0, cand_i0))

        if n_tiles == 1:
            # single tile: candidates ARE the (already-ordered) answer
            out_d_ref[...] = cand_d
            out_i_ref[...] = cand_i
            return

        # final k-extraction over the (TQ, n_tiles*k) candidates
        out_col = jax.lax.broadcasted_iota(jnp.int32, (TQ, k), 1)

        def final(j, c):
            cdc, od, oi = c
            m = jnp.min(cdc, axis=1)
            eq = cdc == m[:, None]
            slot = jnp.min(jnp.where(eq, cand_col, jnp.int32(_IBIG)), axis=1)
            picked = jnp.sum(
                jnp.where(cand_col == slot[:, None], cand_i, 0), axis=1)
            sel = out_col == j
            od = jnp.where(sel, m[:, None], od)
            oi = jnp.where(sel, picked[:, None], oi)
            cdc = jnp.where(cand_col == slot[:, None], _BIG, cdc)
            return (cdc, od, oi)

        _, od, oi = jax.lax.fori_loop(
            0, k, final,
            (cand_d, jnp.full((TQ, k), _BIG, jnp.float32),
             jnp.zeros((TQ, k), jnp.int32)))
        out_d_ref[...] = od
        out_i_ref[...] = oi

    return kernel


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_pallas_tpu(queries, qmask, db, dbmask, k: int):
    m, feat = queries.shape
    n = db.shape[0]
    m_pad = (-m) % TQ
    n_pad = (-n) % TD
    q = jnp.pad(queries, ((0, m_pad), (0, 0)))
    dbp = jnp.pad(db, ((0, n_pad), (0, 0)))
    dpen = jnp.pad(jnp.where(dbmask, 0.0, _BIG), (0, n_pad),
                   constant_values=_BIG)
    mp, np_ = q.shape[0], dbp.shape[0]

    qT = q.T                                   # (F, Mp)
    qq = jnp.sum(q * q, axis=-1)[None, :]      # (1, Mp)
    dbT = dbp.T                                # (F, Np)
    dd = (jnp.sum(dbp * dbp, axis=-1) + dpen)[None, :]  # (1, Np)

    grid = (mp // TQ,)
    out_d, out_i = pl.pallas_call(
        _knn_kernel(k, np_, feat),
        grid=grid,
        in_specs=[
            pl.BlockSpec((feat, TQ), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((feat, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.float32),
            jax.ShapeDtypeStruct((mp, k), jnp.int32),
        ],
    )(qT, qq, dbT, dd)

    out_d = out_d[:m]
    out_i = out_i[:m]
    valid = (out_d < 1e37) & qmask[:, None]
    out_d = jnp.where(valid, jnp.maximum(out_d, 0.0), jnp.inf)
    return out_d, jnp.where(valid, out_i, -1), valid


def on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def knn_pallas(queries, qmask, db, dbmask, k: int):
    """kNN with the Pallas kernel on TPU, XLA fallback elsewhere."""
    if on_tpu():
        return _knn_pallas_tpu(queries, qmask, db, dbmask, k)
    return knn_xla.brute_knn(queries, qmask, db, dbmask, k=k)


def nn_pallas(queries, qmask, db, dbmask):
    d2, idx, valid = knn_pallas(queries, qmask, db, dbmask, 1)
    return d2[:, 0], idx[:, 0], valid[:, 0]
