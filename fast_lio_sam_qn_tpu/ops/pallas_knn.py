"""Pallas TPU kernel for brute-force kNN — the hot op of the whole stack.

Every registration stage funnels into "for each query point, nearest (or
k-nearest) database point": GICP correspondences each GN iteration,
covariance kNN, FPFH neighborhoods, feature matching.  The XLA formulation
(ops/knn.py) materializes (chunked) distance matrices in HBM and pays an
unfused top_k; this kernel streams database tiles through VMEM, computes the
cross-term on the MXU, and extracts per-row results with iterative masked
min-extraction — the (M, N) distance matrix never exists in HBM.

Mosaic notes (see pallas_guide.md): points are passed transposed (F, N) so
the long axis is the 128-lane dimension; masks are pre-baked into additive
penalty rows; candidate buffers are loop-carried VALUES updated with masked
selects (single-column vector stores are not lane-aligned and Mosaic
rejects them).

Extraction uses PACKED KEYS: the low ``ceil(log2(N))`` mantissa bits of each
squared distance are overwritten with the global database column index, so
one int32 min per row yields value AND argmin together, every key is unique
(ties break to the lowest index deterministically, and knockout-by-equality
can never kill two entries), and each of the k extraction rounds costs only
one reduce + one compare-select over the tile (the unpacked formulation
needed six passes).  Cost: squared distances are quantized to
``2^-(23-log2(N))`` relative (~0.1% at N=8192) — irrelevant for radius
gates, histogram weights, and fitness means, which is all callers use d2
for.  IEEE monotonicity makes the int32 compare order match the float
order for the non-negative distances produced here (masked columns carry a
+3.4e38 penalty and sort last; tiny negative rounding residue sorts first,
i.e. as zero).

The public entries `nn_pallas` / `knn_pallas` fall back to the XLA path on
non-TPU backends (CPU tests run the fallback; TPU correctness is covered by
a parity assertion in bench.py and an interpret-mode unit test).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import knn as knn_xla

_BIG = 3.4e38     # python float: jnp scalars would be captured kernel consts
_IMAX = 2 ** 31 - 1
TQ = 256          # query rows per grid step
_TD_CHOICES = (512, 1024, 1536, 2048)
MAX_DB = 1 << 15  # global-index packing budget: 15 mantissa bits


def _choose_td(n: int, k: int) -> tuple[int, int]:
    """Pick the database tile TD and padded size minimizing total extraction
    work: per-row cost ~ n_pad (tile passes) + n_tiles^2 * k (candidate
    updates + merge)."""
    best = None
    for td in _TD_CHOICES:
        n_pad = -(-n // td) * td
        n_tiles = n_pad // td
        cost = n_pad + n_tiles * n_tiles * k
        if best is None or cost < best[0]:
            best = (cost, td, n_pad)
    return best[1], best[2]


def _knn_kernel(k: int, n_db: int, feat: int, td: int):
    n_tiles = n_db // td
    kc = n_tiles * k
    idx_bits = max((n_db - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1

    def kernel(qT_ref, qq_ref, dbT_ref, dd_ref, out_d_ref, out_i_ref):
        qq = qq_ref[0, :]  # (TQ,)
        cand_slot = jax.lax.broadcasted_iota(jnp.int32, (TQ, kc), 1)

        def db_tile(t, cand_key):
            db_t = dbT_ref[:, pl.ds(t * td, td)]      # (F, TD)
            dd_t = dd_ref[0, pl.ds(t * td, td)]       # (TD,)
            cross = jax.lax.dot_general(
                qT_ref[...], db_t,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (TQ, TD)
            # precision=HIGHEST is load-bearing: preferred_element_type only
            # sets the accumulator — the MXU still runs bf16 operand passes
            # by default, which on +-13 m world coordinates puts ~1.2 of
            # absolute error on d2 and flipped 55% of NN picks (mean 0.12 m
            # too far) before GICP ever saw them (round-3 measurement)
            d2 = qq[:, None] - 2.0 * cross + dd_t[None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (TQ, td), 1) + t * td
            keys = (d2.view(jnp.int32) & ~idx_mask) | col

            if k >= 4:
                # pair tournament: fold the tile into (min, max) halves so
                # each extraction scans td/2 keys (min + eq + two selects =
                # ~2*td element-passes vs ~3*td direct — measured ~1.4x on
                # the k=32 FPFH path). Keys are unique, so exactly one
                # position matches the extracted min; its partner is
                # promoted and the pair retired with _IMAX.
                half = td // 2
                rmin = jnp.minimum(keys[:, :half], keys[:, half:])
                rmax = jnp.maximum(keys[:, :half], keys[:, half:])

                def extract(j, c2):
                    rmin, rmax, cand_key = c2
                    m = jnp.min(rmin, axis=1)          # (TQ,) packed min
                    sel_c = cand_slot == (t * k + j)
                    cand_key = jnp.where(sel_c, m[:, None], cand_key)
                    sel = rmin == m[:, None]
                    rmin = jnp.where(sel, rmax, rmin)
                    rmax = jnp.where(sel, jnp.int32(_IMAX), rmax)
                    return (rmin, rmax, cand_key)

                _, _, cand_key = jax.lax.fori_loop(
                    0, k, extract, (rmin, rmax, cand_key))
                return cand_key

            def extract(j, c2):
                keys, cand_key = c2
                m = jnp.min(keys, axis=1)              # (TQ,) packed min
                sel = cand_slot == (t * k + j)
                cand_key = jnp.where(sel, m[:, None], cand_key)
                keys = jnp.where(keys == m[:, None], jnp.int32(_IMAX), keys)
                return (keys, cand_key)

            _, cand_key = jax.lax.fori_loop(0, k, extract, (keys, cand_key))
            return cand_key

        cand_key0 = jnp.full((TQ, kc), _IMAX, jnp.int32)
        cand_key = jax.lax.fori_loop(0, n_tiles, db_tile, cand_key0)

        def decode(key):
            return (key & ~idx_mask).view(jnp.float32), key & idx_mask

        if n_tiles == 1:
            od, oi = decode(cand_key)
            out_d_ref[...] = od
            out_i_ref[...] = oi
            return

        # final k-extraction over the (TQ, n_tiles*k) candidates; keys are
        # globally unique, so knockout-by-equality extracts exactly one
        out_col = jax.lax.broadcasted_iota(jnp.int32, (TQ, k), 1)

        def final(j, c):
            cand_key, okey = c
            m = jnp.min(cand_key, axis=1)
            sel = out_col == j
            okey = jnp.where(sel, m[:, None], okey)
            cand_key = jnp.where(cand_key == m[:, None], jnp.int32(_IMAX),
                                 cand_key)
            return (cand_key, okey)

        _, okey = jax.lax.fori_loop(
            0, k, final, (cand_key, jnp.full((TQ, k), _IMAX, jnp.int32)))
        od, oi = decode(okey)
        out_d_ref[...] = od
        out_i_ref[...] = oi

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _knn_pallas_tpu(queries, qmask, db, dbmask, k: int,
                    interpret: bool = False):
    m, feat = queries.shape
    n = db.shape[0]
    assert n <= MAX_DB, f"db too large for packed-key kNN ({n} > {MAX_DB})"
    td, n_padded = _choose_td(n, k)
    m_pad = (-m) % TQ
    q = jnp.pad(queries, ((0, m_pad), (0, 0)))
    dbp = jnp.pad(db, ((0, n_padded - n), (0, 0)))
    dpen = jnp.pad(jnp.where(dbmask, 0.0, _BIG), (0, n_padded - n),
                   constant_values=_BIG)
    mp, np_ = q.shape[0], dbp.shape[0]

    qT = q.T                                   # (F, Mp)
    qq = jnp.sum(q * q, axis=-1)[None, :]      # (1, Mp)
    dbT = dbp.T                                # (F, Np)
    dd = (jnp.sum(dbp * dbp, axis=-1) + dpen)[None, :]  # (1, Np)

    grid = (mp // TQ,)
    out_d, out_i = pl.pallas_call(
        _knn_kernel(k, np_, feat, td),
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
        interpret=interpret,
    )(qT, qq, dbT, dd)

    out_d = out_d[:m]
    out_i = out_i[:m]
    valid = (out_d < 1e37) & qmask[:, None] & (out_i < n)
    out_d = jnp.where(valid, jnp.maximum(out_d, 0.0), jnp.inf)
    return out_d, jnp.where(valid, out_i, -1), valid


def on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


# ---------------------------------------------------------------------------
# banded (bbox-pruned) variant — morton-local clouds skip far db tiles
# ---------------------------------------------------------------------------

_MORTON_CELL = 0.75  # locality cell [m] (matches fpfh_stream's)
_PRUNE_SLACK = 1.03  # > 1 + 2^-(23-15): keeps quantized-key ties unpruned


def _part1by2(x):
    """Spread the low 10 bits of int32 x across every third bit."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_order(points, mask):
    """Spatial-locality sort order: morton code over _MORTON_CELL cells,
    masked points pushed to the end. Sorting queries AND db makes query
    blocks and db tiles compact in space, so per-tile bbox bounds prune
    most (query block, db tile) pairs. Rigid-transform friendly: a morton
    block's diameter is preserved under rotation, so one sort of the
    source cloud keeps blocks compact across all GICP iterations."""
    lo = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    cell = jnp.clip(((points - lo) / _MORTON_CELL).astype(jnp.int32),
                    0, 1023)
    key = (_part1by2(cell[:, 0]) | (_part1by2(cell[:, 1]) << 1)
           | (_part1by2(cell[:, 2]) << 2))
    key = jnp.where(mask, key, jnp.int32(2 ** 31 - 1))
    return jnp.argsort(key)


def _tile_bboxes(points, valid, n_pad, td):
    """(8, n_tiles) per-db-tile bounds [min xyz | max xyz | 0 0]; masked
    points excluded (+-inf neutral: empty tiles always fail mindist and
    never set the upper bound)."""
    n = points.shape[0]
    p = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    v = jnp.pad(valid, (0, n_pad - n))[:, None]
    pt = p.reshape(-1, td, 3)
    vt = v.reshape(-1, td, 1)
    mins = jnp.min(jnp.where(vt, pt, jnp.inf), axis=1)
    maxs = jnp.max(jnp.where(vt, pt, -jnp.inf), axis=1)
    pad = jnp.zeros_like(mins[:, :1])
    return jnp.concatenate([mins, maxs, pad, pad], axis=1).T


def _block_tile_keep(q, qmask, m_padded, db, dbmask, n_padded, td, k):
    """(n_blocks, n_tiles) i32 keep bitmap: may db tile t hold one of the
    k nearest neighbors of some query in block b?

    Sound for ANY k (not just k=1): each non-empty tile holds >= 1 valid
    point within maxdist2(block bbox, tile bbox) of every query in the
    block, so the k-th smallest per-tile maxdist2 bounds every query's
    k-th NN distance — k distinct tiles contribute k distinct points.
    Tiles with mindist2 beyond that bound (x _PRUNE_SLACK, covering
    packed-key mantissa-truncation ties) cannot change the result. Empty
    tiles carry inf bounds and are dropped; fewer than k non-empty tiles
    makes the bound inf and keeps everything (exact, unpruned)."""
    qb = _tile_bboxes(q, qmask, m_padded, TQ)          # (8, n_blocks)
    tb = _tile_bboxes(db, dbmask, n_padded, td)        # (8, n_tiles)
    qlo, qhi = qb[:3].T[:, None, :], qb[3:6].T[:, None, :]  # (B, 1, 3)
    tlo, thi = tb[:3].T[None], tb[3:6].T[None]              # (1, T, 3)
    e = jnp.maximum(jnp.abs(thi - qlo), jnp.abs(qhi - tlo))
    md2 = jnp.sum(e * e, axis=-1)                           # (B, T)
    gap = jnp.maximum(jnp.maximum(tlo - qhi, qlo - thi), 0.0)
    g2 = jnp.sum(gap * gap, axis=-1)                        # (B, T)
    n_tiles = md2.shape[1]
    kth = jnp.sort(md2, axis=1)[:, min(k, n_tiles) - 1]    # (B,)
    keep = g2 <= kth[:, None] * jnp.float32(_PRUNE_SLACK)
    return keep.astype(jnp.int32)


def _knn_kernel_banded(k: int, n_db: int, feat: int, td: int,
                       block_dim: int = 0):
    """_knn_kernel + bbox tile pruning, driven by a precomputed
    (query-block, db-tile) keep bitmap (see _block_tile_keep): the kernel
    processes only tiles whose keep bit is set — skipped tiles cannot hold
    any of the block's k nearest neighbors (nor tie their packed quantized
    keys), so the result is exactly equal to the unpruned kernel on the
    same sorted inputs (exact equality additionally needs both kernels'
    PADDED db sizes to share a bit length, since idx_bits sets the
    quantization step; true for every shape the product and the tests use,
    and bench.py asserts it on chip every round).

    block_dim: which grid dimension indexes query blocks — 0 for the
    single-cloud grid, 1 for the batched (batch, block) grid.  The batched
    lowering keeps every ref 2-D (batch is flattened into block index
    maps): Mosaic miscompiles these kernels when blocks carry a leading
    singleton axis (chip-measured, tools/prove_vmap_kernels.py), so the
    grid-batched variant reuses the EXACT chip-proven kernel body."""
    n_tiles = n_db // td
    kc = n_tiles * k
    idx_bits = max((n_db - 1).bit_length(), 1)
    idx_mask = (1 << idx_bits) - 1

    def kernel(qT_ref, qq_ref, dbT_ref, dd_ref, keep_ref,
               out_d_ref, out_i_ref):
        qq = qq_ref[0, :]  # (TQ,)
        cand_slot = jax.lax.broadcasted_iota(jnp.int32, (TQ, kc), 1)
        qTv = qT_ref[...]
        blk = pl.program_id(block_dim)

        def tile_near(t):
            return keep_ref[blk, t] != 0

        def db_tile(t, cand_key):
            def process(cand_key):
                db_t = dbT_ref[:, pl.ds(t * td, td)]
                dd_t = dd_ref[0, pl.ds(t * td, td)]
                cross = jax.lax.dot_general(
                    qTv, db_t,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                d2 = qq[:, None] - 2.0 * cross + dd_t[None, :]
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (TQ, td), 1) + t * td
                keys = (d2.view(jnp.int32) & ~idx_mask) | col

                if k >= 4:
                    half = td // 2
                    rmin = jnp.minimum(keys[:, :half], keys[:, half:])
                    rmax = jnp.maximum(keys[:, :half], keys[:, half:])

                    def extract(j, c2):
                        rmin, rmax, ck = c2
                        m = jnp.min(rmin, axis=1)
                        ck = jnp.where(cand_slot == (t * k + j),
                                       m[:, None], ck)
                        sel = rmin == m[:, None]
                        rmin = jnp.where(sel, rmax, rmin)
                        rmax = jnp.where(sel, jnp.int32(_IMAX), rmax)
                        return (rmin, rmax, ck)

                    _, _, cand_key2 = jax.lax.fori_loop(
                        0, k, extract, (rmin, rmax, cand_key))
                    return cand_key2

                def extract(j, c2):
                    keys, ck = c2
                    m = jnp.min(keys, axis=1)
                    ck = jnp.where(cand_slot == (t * k + j),
                                   m[:, None], ck)
                    keys = jnp.where(keys == m[:, None],
                                     jnp.int32(_IMAX), keys)
                    return (keys, ck)

                _, cand_key2 = jax.lax.fori_loop(
                    0, k, extract, (keys, cand_key))
                return cand_key2

            return jax.lax.cond(tile_near(t), process,
                                lambda ck: ck, cand_key)

        cand_key0 = jnp.full((TQ, kc), _IMAX, jnp.int32)
        cand_key = jax.lax.fori_loop(0, n_tiles, db_tile, cand_key0)

        def decode(key):
            return (key & ~idx_mask).view(jnp.float32), key & idx_mask

        if n_tiles == 1:
            od, oi = decode(cand_key)
            out_d_ref[...] = od
            out_i_ref[...] = oi
            return

        out_col = jax.lax.broadcasted_iota(jnp.int32, (TQ, k), 1)

        def final(j, c):
            cand_key, okey = c
            m = jnp.min(cand_key, axis=1)
            okey = jnp.where(out_col == j, m[:, None], okey)
            cand_key = jnp.where(cand_key == m[:, None],
                                 jnp.int32(_IMAX), cand_key)
            return (cand_key, okey)

        _, okey = jax.lax.fori_loop(
            0, k, final, (cand_key, jnp.full((TQ, k), _IMAX, jnp.int32)))
        od, oi = decode(okey)
        out_d_ref[...] = od
        out_i_ref[...] = oi

    return kernel


@functools.lru_cache(maxsize=None)
def _banded_caller(k: int, td: int, interpret: bool):
    """custom_vmap entry for the banded pallas_call: the unbatched path is
    the plain single-cloud kernel; under jax.vmap the rule dispatches to
    the natively GRID-BATCHED kernel (batch = leading grid dim) instead of
    letting Mosaic batch the SMEM-operand kernel — that vmapped lowering
    returns corrupted results on chip (tools/prove_vmap_kernels.py).
    Cached per static config so the custom_vmap object (and its jit cache
    entry) is reused across calls."""

    @jax.custom_batching.custom_vmap
    def call(qT, qq, dbT, dd, keep):
        feat, mp = qT.shape
        np_ = dbT.shape[1]
        return pl.pallas_call(
            _knn_kernel_banded(k, np_, feat, td),
            grid=(mp // TQ,),
            in_specs=[
                pl.BlockSpec((feat, TQ), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TQ), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((feat, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mp // TQ, np_ // td), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TQ, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((mp, k), jnp.float32),
                jax.ShapeDtypeStruct((mp, k), jnp.int32),
            ],
            interpret=interpret,
        )(qT, qq, dbT, dd, keep)

    @call.def_vmap
    def _batched_rule(axis_size, in_batched, qT, qq, dbT, dd, keep):
        args = [a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip((qT, qq, dbT, dd, keep), in_batched)]
        qT, qq, dbT, dd, keep = args
        bsz, feat, mp = qT.shape
        np_ = dbT.shape[2]
        nblk = mp // TQ
        nt = np_ // td
        # Batch is carried purely by the index maps so every ref stays 2-D
        # and the kernel body is the exact chip-proven single-cloud kernel
        # (Mosaic miscompiles these kernels when blocks carry a leading
        # singleton axis — chip-measured, tools/prove_vmap_kernels.py).
        # Mosaic's block rule (sublane dim divisible by 8 or equal to the
        # array dim) forces the layout per operand: wide VMEM operands are
        # LANE-flattened ((B, r, n) -> (r, B*n), block sublane r == array
        # dim r), outputs are ROW-flattened (block sublane TQ % 8 == 0),
        # and the SMEM keep table is row-padded to a multiple of 8.
        nblk8 = -(-nblk // 8) * 8
        keep_p = jnp.pad(keep, ((0, 0), (0, nblk8 - nblk), (0, 0)))
        out_d, out_i = pl.pallas_call(
            _knn_kernel_banded(k, np_, feat, td, block_dim=1),
            grid=(bsz, nblk),
            in_specs=[
                pl.BlockSpec((feat, TQ), lambda b, i: (0, b * nblk + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TQ), lambda b, i: (0, b * nblk + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((feat, np_), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda b, i: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk8, nt), lambda b, i: (b, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TQ, k), lambda b, i: (b * nblk + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, k), lambda b, i: (b * nblk + i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz * mp, k), jnp.float32),
                jax.ShapeDtypeStruct((bsz * mp, k), jnp.int32),
            ],
            interpret=interpret,
        )(jnp.transpose(qT, (1, 0, 2)).reshape(feat, bsz * mp),
          jnp.transpose(qq, (1, 0, 2)).reshape(1, bsz * mp),
          jnp.transpose(dbT, (1, 0, 2)).reshape(feat, bsz * np_),
          jnp.transpose(dd, (1, 0, 2)).reshape(1, bsz * np_),
          keep_p.reshape(bsz * nblk8, nt))
        return (out_d.reshape(bsz, mp, k), out_i.reshape(bsz, mp, k)), \
            (True, True)

    return call


@functools.partial(jax.jit, static_argnames=("k", "interpret", "td"))
def _knn_banded_tpu(queries, qmask, db, dbmask, k: int,
                    interpret: bool = False, td: int = 512):
    """Banded kNN over MORTON-SORTED inputs (see knn_banded)."""
    m, feat = queries.shape
    n = db.shape[0]
    assert n <= MAX_DB, f"db too large for packed-key kNN ({n} > {MAX_DB})"
    # fine tiles, NOT _choose_td: its cost model minimizes unpruned
    # extraction work and picks 2048-wide tiles at k=1 (3 tiles for a 6k
    # db — pruning can then skip almost nothing). Pruned tiles cost ~zero,
    # so small tiles maximize the fraction the bbox test removes.
    n_padded = -(-n // td) * td
    m_pad = (-m) % TQ
    q = jnp.pad(queries, ((0, m_pad), (0, 0)))
    dbp = jnp.pad(db, ((0, n_padded - n), (0, 0)))
    dpen = jnp.pad(jnp.where(dbmask, 0.0, _BIG), (0, n_padded - n),
                   constant_values=_BIG)
    mp, np_ = q.shape[0], dbp.shape[0]
    keep = _block_tile_keep(queries, qmask, mp, db, dbmask, n_padded, td, k)

    qT = q.T
    qq = jnp.sum(q * q, axis=-1)[None, :]
    dbT = dbp.T
    dd = (jnp.sum(dbp * dbp, axis=-1) + dpen)[None, :]

    out_d, out_i = _banded_caller(k, td, interpret)(qT, qq, dbT, dd, keep)

    out_d = out_d[:m]
    out_i = out_i[:m]
    valid = (out_d < 1e37) & qmask[:, None] & (out_i < n)
    out_d = jnp.where(valid, jnp.maximum(out_d, 0.0), jnp.inf)
    return out_d, jnp.where(valid, out_i, -1), valid


def knn_banded(queries, qmask, db, dbmask, k: int):
    """kNN with bbox tile pruning. CALLER CONTRACT: both clouds should be
    morton-sorted (morton_order) for the pruning to bite — results are
    correct for any order, just unpruned-slow when blocks/tiles are not
    spatially compact. Tie-breaks follow the given (sorted) db order.
    Falls back to the XLA brute path off-TPU or beyond MAX_DB."""
    if on_tpu() and db.shape[0] <= MAX_DB:
        return _knn_banded_tpu(queries, qmask, db, dbmask, k)
    return knn_xla.brute_knn(queries, qmask, db, dbmask, k=k)


def nn_banded(queries, qmask, db, dbmask):
    d2, idx, valid = knn_banded(queries, qmask, db, dbmask, 1)
    return d2[:, 0], idx[:, 0], valid[:, 0]


def knn_pallas(queries, qmask, db, dbmask, k: int):
    """kNN with the Pallas kernel on TPU, XLA fallback elsewhere — and for
    databases beyond the packed-key index budget (MAX_DB)."""
    if on_tpu() and db.shape[0] <= MAX_DB:
        return _knn_pallas_tpu(queries, qmask, db, dbmask, k)
    return knn_xla.brute_knn(queries, qmask, db, dbmask, k=k)


def nn_pallas(queries, qmask, db, dbmask):
    d2, idx, valid = knn_pallas(queries, qmask, db, dbmask, 1)
    return d2[:, 0], idx[:, 0], valid[:, 0]
