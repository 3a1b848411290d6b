"""Surfel voxel map — accumulated per-voxel moments with cached planes.

The second-generation LIO local map (first: ops/hashgrid.py's 1-point-per-
voxel grid). Instead of storing representative points and re-running kNN +
plane fits per query point per IESEKF iteration, each voxel accumulates the
FULL second-order moments (count, sum, outer-product sum) of every point
ever inserted — pure scatter-adds, the friendliest possible op shape for
XLA — and caches a fitted plane (normal, offset, validity) computed from
its neighborhood's combined moments at insert time.

Queries then cost ONE probed lookup per point: gather the packed plane row
and the point-to-plane residual is n.p + d. The expensive work
(neighborhood moment gathers + batched 3x3 eigendecompositions) runs once
per scan over the TOUCHED voxels only, instead of 3x per scan over every
scan point.

PACKED LAYOUT (round 2): the per-scan insert is scatter/gather-OP-bound on
TPU (~1-3 ms per 32k-row scatter call regardless of row width), so the
table stores
  - ``mom``   (T, 10): [count, psum(3), m2_sym(6 — xx yy zz xy xz yz)]
  - ``plane`` (T, 6):  [n(3), d, valid, halo_dirty]
and every stage issues ONE scatter/gather per table instead of 3-4 per
field (measured: 3-field moment scatter 8.9 ms -> one packed scatter; the
m2 symmetry also cuts moment bytes 13 -> 10). Convenience properties
(`count`, `psum`, `m2`, `plane_n`, ...) unpack views for tests/exports.

Accuracy note: planes fit over accumulated moments of a face (7-voxel) or
3^3 neighborhood — a true surfel map (cf. VoxelMap / PV-LIO [external])
rather than FAST-LIO's 5-NN instantaneous fits; neighbors' cached planes
go slightly stale until they are next touched (documented approximation;
the map converges over scans, much like ikd-tree's amortized rebalancing).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import linalg3
from .hashgrid import _probe_slots, _scatter_rounds
from .voxel import voxel_coords

_INT_MAX = jnp.iinfo(jnp.int32).max


class SurfelMap(NamedTuple):
    key: jax.Array         # (T, 4) i32 [voxel coords | occupied 0/1] —
    #                        ONE table so every verified-probe site
    #                        (locate, nbr lookup) gathers once, not twice
    #                        (the insert is table-op-issue-bound, see
    #                        tools/roofline.insert_budget)
    mom: jax.Array         # (T, 10) packed center-relative moments
    plane: jax.Array       # (T, 6) packed cached plane + flags
    nbr: jax.Array         # (T, 6) i32 face-neighbor slot hints (-1 = none)
    res: float             # static voxel edge

    @property
    def table_size(self) -> int:
        return self.key.shape[0]

    # ---- unpacked views (tests/exports; hot paths use packed rows) ----
    @property
    def coords(self) -> jax.Array:
        return self.key[:, :3]

    @property
    def occupied(self) -> jax.Array:
        return self.key[:, 3] > 0

    @property
    def count(self) -> jax.Array:
        return self.mom[:, 0]

    @property
    def psum(self) -> jax.Array:
        return self.mom[:, 1:4]

    @property
    def m2(self) -> jax.Array:
        return _sym_to_mat(self.mom[:, 4:10])

    @property
    def plane_n(self) -> jax.Array:
        return self.plane[:, :3]

    @property
    def plane_d(self) -> jax.Array:
        return self.plane[:, 3]

    @property
    def plane_valid(self) -> jax.Array:
        return self.plane[:, 4] > 0.5

    @property
    def halo_dirty(self) -> jax.Array:
        return self.plane[:, 5] > 0.5


# a refit marks a voxel halo-dirty when its plane moved by more than these
# (normal angle ~3 deg, offset 2 cm) — halo propagation then refreshes the
# voxel's face neighbors and clears the bit
_HALO_COS_TOL = 0.9986
_HALO_D_TOL = 0.02

# steady-state claim batch: scans claim at most this many new voxels via
# the compacted path; more claimable points (cold start) use the full batch
_CLAIM_CAP = 4096

# winner-row compaction cap for the nbr-hint maintenance fan (steady-state
# frontiers are a few hundred rows; cold starts fall back to the full batch)
_NBR_MAINT_CAP = 1024

# face-neighbor offsets, order [+x -x +y -y +z -z]. Opposite face = f ^ 1.
# This order is shared by the nbr hint table, the halo fan, and
# _hood_offsets(7)[1:] — the nbr-cache lookups rely on it.
_FACE = jnp.asarray(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
     [0, 0, -1]], jnp.int32)


def _class_rank(key: jax.Array, num_classes: int) -> jax.Array:
    """Stable rank of each row under ascending-key order, for keys taking
    values in [0, num_classes).  rank == argsort-position: rows of class c
    rank after all rows of classes < c, preserving row order within a
    class — exactly jnp.argsort(key, stable=True)'s permutation, computed
    with num_classes cumsums instead of a sort (a 32k-row sort is a
    multi-pass O(n log^2 n) TPU program; the scan is one vector pass per
    class)."""
    key = key.astype(jnp.int32)
    rank = jnp.zeros(key.shape[0], jnp.int32)
    offset = jnp.int32(0)
    for c in range(num_classes):
        isc = (key == c).astype(jnp.int32)
        pos = jnp.cumsum(isc)
        rank = jnp.where(isc > 0, offset + pos - 1, rank)
        offset = offset + pos[-1]
    return rank


def _compact_idx(key: jax.Array, cap: int, num_classes: int = 2):
    """Row indices of the first `cap` rows by stable ascending-key order
    (boolean callers pass ~wanted so wanted rows come first) — bit-equal to
    jnp.argsort(key, stable=True)[:cap] for keys in [0, num_classes).
    Requires cap <= len(key) (all call sites guard this), which makes the
    rank->row scatter cover every output position."""
    assert cap <= key.shape[0]
    rank = _class_rank(key, num_classes)
    rows = jnp.arange(key.shape[0], dtype=jnp.int32)
    return jnp.zeros(cap, jnp.int32).at[rank].set(rows, mode="drop")


def _compact(key: jax.Array, cap: int, *arrays: jax.Array,
             num_classes: int = 2):
    """Compact rows to the first `cap` by stable ascending-key order — the
    fixed-shape compaction idiom shared by the hood-refit, claim, and halo
    paths.  Gathers only the `cap` surviving rows (the argsort formulation
    permuted the FULL arrays before slicing)."""
    idx = _compact_idx(key, cap, num_classes)
    return tuple(a[idx] for a in arrays)


def _sym_to_mat(s: jax.Array) -> jax.Array:
    """(..., 6) [xx yy zz xy xz yz] -> (..., 3, 3) symmetric matrix."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], -2)


def _outer_sym(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 6) symmetric outer product [xx yy zz xy xz yz]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], -1)


def _cross_sym(a: jax.Array, b: jax.Array) -> jax.Array:
    """sym(a b^T + b a^T) in packed form."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([
        2 * ax * bx, 2 * ay * by, 2 * az * bz,
        ax * by + ay * bx, ax * bz + az * bx, ay * bz + az * by], -1)


@functools.partial(jax.jit, static_argnames=("res", "table_size"))
def empty(res: float, table_size: int) -> SurfelMap:
    assert table_size & (table_size - 1) == 0
    return SurfelMap(
        key=jnp.zeros((table_size, 4), jnp.int32),
        mom=jnp.zeros((table_size, 10), jnp.float32),
        plane=jnp.zeros((table_size, 6), jnp.float32),
        nbr=jnp.full((table_size, 6), -1, jnp.int32),
        res=res,
    )


def _pack_key(coords: jax.Array, occupied: jax.Array) -> jax.Array:
    """(T, 3) i32 coords + (T,) bool -> (T, 4) packed key table (one
    full-table linear pass — cheap next to any random-index table op)."""
    return jnp.concatenate(
        [coords, occupied.astype(jnp.int32)[:, None]], axis=1)


def _vox_center(coords: jax.Array, res: float) -> jax.Array:
    """World-space center of each voxel. Moments are accumulated RELATIVE
    to this center so every stored quantity has magnitude <= res/2: the
    naive cov = E[ppT] - mean meanT form cancels ~|mean|^2 (~100s of m^2)
    against itself to recover a plane variance of ~1e-3 m^2, which in f32
    leaves platform-dependent noise bigger than the signal (TPU and CPU
    disagreed on ~6% of fitted normals; the LIO diverged on TPU only)."""
    return (coords.astype(jnp.float32) + 0.5) * res


def _locate(m: SurfelMap, coords: jax.Array):
    """(..., 3) coords -> (slot (...,), found (...,)) via verified probes.
    ONE packed-key gather per probe set (coords + occupancy ride the same
    (T, 4) row)."""
    slots = _probe_slots(coords, m.table_size)             # (..., P)
    kv = m.key[slots]                                      # (..., P, 4)
    hit = (kv[..., 3] > 0) & jnp.all(
        kv[..., :3] == coords[..., None, :], -1)
    first = jnp.argmax(hit, axis=-1)
    found = jnp.any(hit, axis=-1)
    slot = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
    return jnp.where(found, slot, 0), found


def _locate_flat(m: SurfelMap, coords: jax.Array, cap: int = None):
    """Bit-equal to ``_locate`` for (N, 3) coords, cheaper for the big
    flat batches (the insert's initial locate and query_planes w=1).

    ``_locate`` fetches all NUM_PROBES candidate rows for every coord
    (4N random rows); in steady state ~90% of coords resolve at probe 0
    (table load ~10%), so this gathers probe 0 only (N rows), compacts
    the misses (empty probe-0 slot does NOT prove absence — eviction can
    hollow out earlier probes — so every probe-0 miss is re-probed), and
    finishes probes 1..P-1 on that `cap`-row subset.  lax.cond falls back
    to the full locate when the miss count exceeds cap (cold start /
    frontier-heavy scans).  Stable compaction + identical probe order
    keep the result bit-equal to _locate."""
    n = coords.shape[0]
    if cap is None:
        cap = max(256, n // 4)
    if cap >= n:
        return _locate(m, coords)
    slots = _probe_slots(coords, m.table_size)             # (N, P)
    s0 = slots[:, 0]
    kv0 = m.key[s0]                                        # (N, 4) gather
    hit0 = (kv0[:, 3] > 0) & jnp.all(kv0[:, :3] == coords, -1)
    slot0 = jnp.where(hit0, s0, 0)

    def fast(_):
        ridx = _compact_idx(hit0, cap)          # misses first, stable
        need = jnp.logical_not(hit0[ridx])      # cap may overcover hits
        bslots = slots[ridx][:, 1:]             # (cap, P-1)
        kv = m.key[bslots]                      # (cap, P-1, 4) gather
        bhit = (kv[..., 3] > 0) & jnp.all(
            kv[..., :3] == coords[ridx][:, None, :], -1)
        bfirst = jnp.argmax(bhit, axis=-1)
        bfound = jnp.any(bhit, axis=-1)
        bslot = jnp.where(
            bfound,
            jnp.take_along_axis(bslots, bfirst[:, None], axis=-1)[:, 0], 0)
        # apply only true-miss rows; out-of-range index drops the rest
        safe = jnp.where(need, ridx, n)
        return (slot0.at[safe].set(bslot, mode="drop"),
                hit0.at[safe].set(bfound, mode="drop"))

    return jax.lax.cond(
        jnp.sum(jnp.logical_not(hit0)) <= cap, fast,
        lambda _: _locate(m, coords), None)


def _nbr_lookup(m: SurfelMap, slots: jax.Array, coords_s: jax.Array):
    """Face-neighbor slots of the voxels at `slots` (whose coords are
    `coords_s`) via the (T, 6) hint table — ONE verified gather instead of
    NUM_PROBES probed ones per neighbor. Hits are verified (occupied +
    coords match), so a stale hint can never return a wrong slot; the
    claim-time maintenance (_claim_maintain_nbr) keeps the invariant that
    face-adjacent PRESENT voxels always point at each other, so a verified
    miss really means the neighbor is absent (bit-equal to _locate).
    Returns (nslot (..., 6), nfound (..., 6))."""
    t = m.table_size
    ns = m.nbr[slots]                                     # (..., 6)
    nsc = jnp.clip(ns, 0, t - 1)
    expect = coords_s[..., None, :] + _FACE
    kv = m.key[nsc]                                       # ONE gather
    ok = (ns >= 0) & (kv[..., 3] > 0) & jnp.all(
        kv[..., :3] == expect, axis=-1)
    return jnp.where(ok, nsc, 0), ok


def _claim_maintain_nbr(m_post: SurfelMap, bcoords: jax.Array,
                        point_slot: jax.Array) -> jax.Array:
    """Restore the face-neighbor invariant after a claim batch: every row
    with point_slot >= 0 just won a previously-empty slot (one unique
    winner per slot). Locate its 6 face neighbors on the POST-claim map
    (so batch siblings resolve), then write both directions:
      nbr[winner, f]        = neighbor slot (or -1 — fresh hint row)
      nbr[neighbor, f ^ 1]  = winner slot
    Back-pointer cells are unique per (slot, face) — two distinct new
    voxels can never claim the same face of the same neighbor — and the
    one possible overlap (two adjacent winners writing each other) writes
    identical values, so scatter order cannot matter. Eviction leaves
    hints stale-but-verifiable: occupied=False fails _nbr_lookup's check,
    and a re-claim of the slot rewrites its hint row here."""
    t = m_post.table_size

    def maintain(bcoords, point_slot):
        won = point_slot >= 0
        wslot = jnp.where(won, point_slot, t)             # t -> dropped
        ncoords = bcoords[:, None, :] + _FACE[None]       # (B, 6, 3)
        nslot, nfound = _locate(m_post, ncoords)          # (B, 6)
        eff = won[:, None] & nfound
        fwd = jnp.where(eff, nslot, -1)
        nbr = m_post.nbr.at[wslot].set(fwd, mode="drop")
        bslot = jnp.where(eff, nslot, t)
        opp = jnp.broadcast_to(
            jnp.arange(6, dtype=jnp.int32)[None, :] ^ 1, bslot.shape)
        back = jnp.broadcast_to(wslot[:, None], bslot.shape)
        return nbr.at[bslot, opp].set(back, mode="drop")

    # the claim batch is a STATIC-shaped compaction (e.g. 4096 rows) but
    # actual winners are the steady-state frontier (~hundreds): compact
    # the maintenance fan to the winner rows or the whole cost saved by
    # the hint lookups is spent right back on the maintenance locate
    b = bcoords.shape[0]
    if _NBR_MAINT_CAP < b:
        won = point_slot >= 0

        def compactm(_):
            midx = _compact_idx(jnp.logical_not(won), _NBR_MAINT_CAP)
            return maintain(bcoords[midx], point_slot[midx])

        return jax.lax.cond(
            jnp.sum(won) <= _NBR_MAINT_CAP, compactm,
            lambda _: maintain(bcoords, point_slot), None)
    return maintain(bcoords, point_slot)


def _neighbor_offsets():
    import numpy as _np

    r = _np.arange(-1, 2, dtype=_np.int32)
    ox, oy, oz = _np.meshgrid(r, r, r, indexing="ij")
    return jnp.asarray(
        _np.stack([ox.ravel(), oy.ravel(), oz.ravel()], -1))


def _hood_offsets(window: int):
    """Neighborhood offsets for the hood refit. 27 = full 3^3; 7 = center +
    six faces (4x less gather traffic — the dominant insert cost at
    production scan sizes; the face hood is also SHARPER at creases since
    it mixes less of adjacent surfaces — measured sim ATE 0.079 m vs 0.22
    with the full 3^3 hood)."""
    if window == 27:
        return _neighbor_offsets()
    assert window == 7
    return jnp.concatenate(
        [jnp.zeros((1, 3), jnp.int32), _FACE], axis=0)


def _plane_from(cnt, psum, m2_sym, center):
    """Fit (n, d, thickness, spread) from center-relative packed moments.

    Moments MUST be relative to `center` (see _vox_center): the covariance
    subtraction is then between ~res-sized quantities, platform-stable in
    f32. `spread` = sqrt(mid eigenvalue) — a valid plane needs BOTH a thin
    normal direction AND real in-plane spread: points on a line/edge have
    lam0 ~ lam1 ~ 0, pass any thickness gate, and get an arbitrary
    (platform-lottery) normal — measured: 2% of voxels, enough to diverge
    the IESEKF on TPU while the same run converged on CPU."""
    denom = jnp.maximum(cnt, 1.0)
    mean = psum / denom[:, None]                          # center-rel
    cov_sym = m2_sym / denom[:, None] - _outer_sym(mean)
    # struct-of-arrays eigendecomposition: batch in the lanes; packed
    # order here is [xx yy zz xy xz yz], eigh3_soa wants (00,01,02,11,12,22)
    evals, evecs = linalg3.eigh3_soa(
        cov_sym[:, 0], cov_sym[:, 3], cov_sym[:, 4],
        cov_sym[:, 1], cov_sym[:, 5], cov_sym[:, 2])
    n = jnp.stack([evecs[0][0], evecs[1][0], evecs[2][0]], axis=-1)
    d = -jnp.sum(n * (center + mean), axis=-1)
    thick = jnp.sqrt(jnp.maximum(evals[0], 0.0))
    spread = jnp.sqrt(jnp.maximum(evals[1], 0.0))         # in-plane
    return n, d, thick, spread


def _pack_plane(n, d, valid, dirty):
    """Rows for the packed plane table."""
    return jnp.concatenate([
        n, d[:, None], valid.astype(jnp.float32)[:, None],
        dirty.astype(jnp.float32)[:, None]], axis=-1)


def _plane_changed(n_new, d_new, prev_rows):
    """Did the fit move past the halo tolerances? Sign-aligned since
    (n, d) and (-n, -d) are the same plane."""
    n_prev, d_prev = prev_rows[:, :3], prev_rows[:, 3]
    v_prev = prev_rows[:, 4] > 0.5
    dot = jnp.sum(n_new * n_prev, axis=-1)
    s = jnp.where(dot < 0, -1.0, 1.0)
    return (~v_prev | (jnp.abs(dot) < _HALO_COS_TOL)
            | (jnp.abs(d_new - s * d_prev) > _HALO_D_TOL))


@functools.partial(
    jax.jit, static_argnames=("min_pts", "hood_cap", "hood_window"))
def _refit_planes(m: SurfelMap, slots: jax.Array, slot_valid: jax.Array,
                  thickness: jax.Array, min_pts: int = 6,
                  hood_cap: int | None = None,
                  hood_window: int = 27) -> SurfelMap:
    """Recompute cached planes for the given slots.

    Two-phase adaptive fit:
    1. OWN-moments fit for every slot (cheap: one packed gather) —
       preferred when the voxel is well-populated and tight (sharper at
       creases, where the hood mixes two surfaces; a handful of
       volume-scattered points is often accidentally planar, hence the
       3*min_pts population gate);
    2. neighborhood-moments fit ONLY for the slots whose own fit did not
       qualify, compacted to a static `hood_cap` — the hood gathers
       dominate insert cost at production scan sizes. Immature slots
       beyond the cap keep their previous plane until next touched
       (amortized refresh, akin to ikd-tree's deferred rebalancing).
    hood_cap=None processes all slots through the hood path (exact)."""
    s_rows = slots.shape[0]
    min_spread = 0.5 * thickness
    mom_o = m.mom[slots]                                  # ONE gather
    cnt_o = mom_o[:, 0]
    center_o = _vox_center(m.key[slots, :3], m.res)
    n_o, d_o, th_o, sp_o = _plane_from(
        cnt_o, mom_o[:, 1:4], mom_o[:, 4:10], center_o)
    use_own = (cnt_o >= 3 * min_pts) & (th_o < thickness) & (
        sp_o > min_spread)

    # previous plane rows (change detection + dirty-bit carry)
    prev_o = m.plane[slots]                               # ONE gather

    # phase 1: scatter own-fit plane rows (valid + dirty folded in)
    own_rows = slot_valid & use_own
    dirty_o = prev_o[:, 5] > 0.5
    new_dirty_o = dirty_o | _plane_changed(n_o, d_o, prev_o)
    rows_o = _pack_plane(n_o, d_o, own_rows, new_dirty_o & own_rows)
    safe_o = jnp.where(own_rows, slots, m.table_size)
    plane = m.plane.at[safe_o].set(rows_o, mode="drop")   # ONE scatter

    # phase 2: hood fit for the rest (compacted when capped)
    need_hood = slot_valid & ~use_own
    if hood_cap is not None and hood_cap < s_rows:
        h_idx = _compact_idx(jnp.logical_not(need_hood), hood_cap)
        h_slots = slots[h_idx]
        h_valid = need_hood[h_idx]
        # reconstruction below is exact only when EVERY hood row made the
        # compacted batch (overflow drops rows whose slot may still be
        # refit through a duplicate row — the table then disagrees with
        # the per-row estimate)
        recon_exact = jnp.sum(need_hood) <= hood_cap
    else:
        h_idx = None
        h_slots = slots
        h_valid = need_hood
        recon_exact = jnp.asarray(True)
    kv_h = m.key[h_slots]                                 # ONE gather
    coords = kv_h[:, :3]
    offs = _hood_offsets(hood_window)

    def do_hood(plane):
        if hood_window == 7:
            # face hood = self + the 6 hinted neighbors: one verified
            # gather replaces the (H, 7, P) probe cascade. Self is its own
            # slot by construction (h_slots are located/claimed rows).
            ns6, ok6 = _nbr_lookup(m, h_slots, coords)
            nslot = jnp.concatenate([h_slots[:, None], ns6], axis=1)
            nfound = jnp.concatenate(
                [(kv_h[:, 3] > 0)[:, None], ok6], axis=1)
        else:
            ncoords = coords[:, None, :] + offs[None]     # (H, W, 3)
            nslot, nfound = _locate(m, ncoords)
        w = (nfound & h_valid[:, None]).astype(jnp.float32)
        # neighbor moments are relative to THEIR center; shift to the
        # central voxel's center (delta = offset * res, exact in f32)
        # before combining. All magnitudes stay <= 1.5*res: no
        # cancellation, platform-stable.
        delta = offs.astype(jnp.float32) * m.res          # (W, 3)
        mom_j = m.mom[nslot] * w[..., None]               # ONE (H, W, 10)
        cnt_j = mom_j[..., 0]
        psum_j = mom_j[..., 1:4]
        m2_j = mom_j[..., 4:10]
        # m2' = m2 + sym(delta psum^T + psum delta^T) + cnt * sym(delta^2)
        dsym = _outer_sym(delta)                          # (W, 6)
        cross = _cross_sym(jnp.broadcast_to(delta, psum_j.shape), psum_j)
        cnt = jnp.sum(cnt_j, axis=1)                      # (H,)
        psum = jnp.sum(psum_j + cnt_j[..., None] * delta[None], axis=1)
        m2 = jnp.sum(m2_j + cross + cnt_j[..., None] * dsym[None], axis=1)
        center_h = _vox_center(coords, m.res)
        n_h, d_h, th_h, sp_h = _plane_from(cnt, psum, m2, center_h)
        h_ok = (cnt >= min_pts) & (th_h < thickness) & (sp_h > min_spread)
        prev_h = m.plane[h_slots]
        write = h_valid
        valid_new = write & h_ok
        dirty_new = (prev_h[:, 5] > 0.5) | _plane_changed(n_h, d_h, prev_h)
        rows_h = _pack_plane(n_h, d_h, valid_new, dirty_new & valid_new)
        safe_h = jnp.where(write, h_slots, m.table_size)
        return plane.at[safe_h].set(rows_h, mode="drop"), rows_h

    # steady-state fast path: no immature voxels this scan -> skip the
    # whole hood gather/fit block (identical semantics: with zero valid
    # rows every hood scatter is a no-op, and the zero rows_h are h_valid-
    # masked out of the reconstruction)
    plane, rows_h = jax.lax.cond(
        jnp.any(h_valid), do_hood,
        lambda p: (p, jnp.zeros((h_slots.shape[0], 6), jnp.float32)),
        plane)

    # per-input-row POST-refit plane rows, reconstructed without touching
    # the table (saves the caller's 32k-row after_rows gather): own-fit
    # rows take rows_o, hood-batch rows take rows_h (scattered back by
    # original row index), everything else kept its previous row. Exact
    # unless the hood batch overflowed (recon_exact False — cold start).
    after_est = jnp.where(own_rows[:, None], rows_o, prev_o)
    if h_idx is not None:
        after_est = after_est.at[
            jnp.where(h_valid, h_idx, s_rows)].set(rows_h, mode="drop")
    else:
        after_est = jnp.where(h_valid[:, None], rows_h, after_est)
    # prev_o is returned so the caller does not re-gather the pre-refit
    # plane rows it needs for frontier/dirty bookkeeping (a 32k-row
    # gather saved per insert)
    return m._replace(plane=plane), prev_o, after_est, recon_exact


@functools.partial(jax.jit, static_argnames=(
    "hood_cap", "halo", "halo_cap", "hood_window"))
def insert(m: SurfelMap, points: jax.Array, mask: jax.Array,
           thickness: jax.Array, hood_cap: int | None = None,
           halo: bool = True, halo_cap: int | None = None,
           hood_window: int = 27) -> SurfelMap:
    """Accumulate points into voxel moments and refresh the touched voxels'
    cached planes. One scatter-heavy program per scan. hood_cap bounds the
    expensive neighborhood-refit list and halo_cap the halo-propagation
    source list (see _refit_planes / step 4); for BOTH caps, 0 and None
    mean UNCAPPED (matching LioConfig's "0/None = unbounded" convention —
    to disable halo propagation entirely pass halo=False, not halo_cap=0);
    hood_window = 27 (full 3^3) or 7 (face hood, ~4x cheaper refit gathers
    and sharper at creases). halo=False skips the halo-plane propagation
    (step 4) — ablation/profiling only."""
    t = m.table_size
    coords = voxel_coords(points, m.res)

    # 1. locate existing voxels; claim slots for new ones. Steady-state
    # scans mostly touch EXISTING voxels, so the claim machinery is
    # data-adaptive (ikd-tree-like amortization), three tiers by the
    # number of claimable points, all with identical semantics:
    #  - zero: skip claiming entirely (every claim scatter would no-op);
    #  - few (the steady state — a frontier of fresh voxels per scan):
    #    compact the claimable rows to _CLAIM_CAP and run the scatter-min
    #    rounds over that small batch;
    #  - many (cold start / entering unmapped areas): full-batch rounds.
    slot, found = _locate_flat(m, coords)
    claimable = mask & ~found
    need_claim = jnp.any(claimable)
    n_pts0 = points.shape[0]
    claim_cap = min(_CLAIM_CAP, n_pts0)

    def do_claim(_):
        occ0 = m.occupied

        def claim_with(bcoords, bmask):
            w0 = jnp.full((t + 1,), _INT_MAX, jnp.int32)
            occ1, winner, pslot = _scatter_rounds(
                occ0, w0, bcoords, bmask, t)
            winner = winner[:t]
            newly = winner != _INT_MAX
            widx = jnp.where(newly, winner, 0)
            new_coords = jnp.where(newly[:, None], bcoords[widx],
                                   m.key[:, :3])
            return _pack_key(new_coords, occ1), pslot

        def compact(_):
            # relocate ONLY the compacted rows afterwards: claims fill
            # previously-EMPTY slots with NEW coords, so no existing row's
            # probe resolution can change — everything outside ridx keeps
            # its first-locate slot (saves a full n-row relocate)
            ridx = _compact_idx(jnp.logical_not(claimable), claim_cap)
            bcoords = coords[ridx]
            bmask = claimable[ridx]
            key1, pslot = claim_with(bcoords, bmask)
            m1 = m._replace(key=key1)
            nbr1 = _claim_maintain_nbr(m1, bcoords, pslot)
            bslot, bfound = _locate(m1, bcoords)
            slot2 = slot.at[ridx].set(jnp.where(bmask, bslot, slot[ridx]))
            found2 = found.at[ridx].set(bfound | found[ridx])
            return key1, nbr1, slot2, found2

        def full(_):
            key1, pslot = claim_with(coords, claimable)
            m1 = m._replace(key=key1)
            nbr1 = _claim_maintain_nbr(m1, coords, pslot)
            # points that landed in a claimed-new slot get that slot
            slot2, found2 = _locate(m1, coords)
            return key1, nbr1, slot2, found2

        if claim_cap < n_pts0:
            return jax.lax.cond(
                jnp.sum(claimable) <= claim_cap, compact, full, None)
        return full(None)

    def skip_claim(_):
        return m.key, m.nbr, slot, found

    key2, nbr, slot2, found2 = jax.lax.cond(
        need_claim, do_claim, skip_claim, None)
    m = m._replace(key=key2, nbr=nbr)
    use = mask & found2
    sidx = jnp.where(use, slot2, t)  # dump row

    # 2. scatter-add center-relative moments — ONE packed (n, 10) scatter
    # (see _vox_center for why center-relative)
    cnt_before = m.mom[jnp.clip(sidx, 0, t - 1), 0]  # 0: new or halo-only
    w = use.astype(jnp.float32)
    rel = points - _vox_center(coords, m.res)
    upd = jnp.concatenate(
        [w[:, None], rel * w[:, None], _outer_sym(rel) * w[:, None]],
        axis=-1)                                          # (n, 10)
    added = jnp.zeros((t + 1, 10), jnp.float32).at[sidx].add(upd)[:t]
    m = m._replace(mom=m.mom + added)

    # 3. refit planes of touched voxels (one slot per unique touched voxel;
    # duplicates refit redundantly but harmlessly). prev_rows are the
    # pre-refit plane rows (returned by the refit, which gathers them
    # anyway for change detection).
    m, prev_rows, after_est, recon_exact = _refit_planes(
        m, jnp.clip(sidx, 0, t - 1), use, thickness, hood_cap=hood_cap,
        hood_window=hood_window)
    valid_before = prev_rows[:, 4] > 0.5

    if not halo:
        return m

    # 4. halo: propagate each touched voxel's plane into its UNMAPPED face
    # neighbors (count==0). Points from a lagging pose estimate land one
    # voxel outside the mapped surface; without a plane there, the update
    # never sees the residuals that would pull the estimate back (measured
    # 2x worse drift). Halo planes cost zero extra gathers at query time
    # and are overwritten by real fits once points arrive.
    n_pts = points.shape[0]
    # halo sources = the FRONTIER (voxels receiving their first points —
    # cnt_before==0 covers newly-claimed slots AND halo-only slots
    # materializing, which must keep extending the halo outward — plus
    # planes that just turned valid) UNION touched voxels whose plane is
    # HALO-DIRTY (changed since its last propagation — set by
    # _refit_planes when a refit moves the plane past
    # _HALO_COS_TOL/_HALO_D_TOL). Early on, planes churn and most touched
    # voxels re-propagate (freezing halos at creation quality measurably
    # degrades the IESEKF: sim ATE 0.22 -> 0.47 with 0/13 loops accepted);
    # once the map converges the dirty set — and the halo cost — shrinks
    # toward zero. Re-fanning ALL 6*n_pts faces every scan is the naive
    # extreme (~20 ms of the 74 ms insert at 32k points). Dirty sources
    # beyond halo_cap keep their bit and retry next scan.
    # post-refit rows come from the refit's per-row reconstruction
    # (elementwise + one hood_cap-row scatter) instead of a 32k-row table
    # gather; the gather survives only as the lax.cond fallback for the
    # hood-batch-overflow case (cold start), keeping semantics bit-exact.
    after_rows = jax.lax.cond(
        recon_exact, lambda: after_est,
        lambda: m.plane[jnp.clip(sidx, 0, t - 1)])
    valid_after = after_rows[:, 4] > 0.5
    dirty = after_rows[:, 5] > 0.5
    frontier = (cnt_before == 0.0) | (valid_after & ~valid_before)
    src_plane_ok = use & valid_after & (frontier | dirty)
    halo_cap = min(n_pts, (halo_cap or n_pts))
    if halo_cap < n_pts:
        # priority: frontier first, dirty refresh second
        prio = jnp.where(use & valid_after & frontier, 0,
                         jnp.where(src_plane_ok, 1, 2)).astype(jnp.int32)
        h_src_coords, h_src_sidx, src_plane_ok = _compact(
            prio, halo_cap, coords, sidx, src_plane_ok, num_classes=3)
    else:
        h_src_coords = coords
        h_src_sidx = sidx

    def do_halo(m: SurfelMap) -> SurfelMap:
        src_clip = jnp.clip(h_src_sidx, 0, t - 1)
        # propagated sources are now in sync with their halos: rewrite the
        # full plane row with the dirty flag cleared (one scatter)
        src_rows = m.plane[src_clip]
        cleared = src_rows.at[:, 5].set(0.0)
        m = m._replace(plane=m.plane.at[
            jnp.where(src_plane_ok, src_clip, t)
        ].set(cleared, mode="drop"))
        hcoords = (h_src_coords[:, None, :] + _FACE[None]).reshape(
            halo_cap * 6, 3)
        hmask = jnp.repeat(src_plane_ok, 6)
        # fan targets ARE the sources' face neighbors: the hint table
        # answers the (6H,) locate with one verified gather. Masked-off
        # rows (src_plane_ok False) may disagree with a probe locate, but
        # every consumer of hslot/hfound is hmask-gated, so outputs are
        # unchanged.
        ns6, ok6 = _nbr_lookup(m, src_clip, h_src_coords)
        hslot0 = ns6.reshape(halo_cap * 6)
        hfound = ok6.reshape(halo_cap * 6)
        # rows whose target slot is unmapped — only these bid for slots.
        # In steady state most halo targets already exist (dirty-plane
        # re-propagation overwrites existing halo slots), so the claim
        # rounds and the post-claim relocate run over a compacted batch
        # like the insert's own claim tiers (identical semantics: the
        # compact path fires only when every needing row fits the cap,
        # and stable compaction preserves bid order)
        need = hmask & ~hfound

        def hclaim(bcoords, bmask):
            winner0 = jnp.full((t + 1,), _INT_MAX, jnp.int32)
            occupied2, hwinner, pslot = _scatter_rounds(
                m.occupied, winner0, bcoords, bmask, t)
            hwinner = hwinner[:t]
            hnew = hwinner != _INT_MAX
            hidx = jnp.where(hnew, hwinner, 0)
            coords2 = jnp.where(hnew[:, None], bcoords[hidx], m.key[:, :3])
            return _pack_key(coords2, occupied2), pslot

        def hclaim_compact(_):
            cidx = _compact_idx(jnp.logical_not(need), _CLAIM_CAP)
            bcoords = hcoords[cidx]
            bmask = need[cidx]
            key2, pslot = hclaim(bcoords, bmask)
            m2 = m._replace(key=key2)
            nbr2 = _claim_maintain_nbr(m2, bcoords, pslot)
            bslot, bfound = _locate(m2, bcoords)
            hslot = hslot0.at[cidx].set(
                jnp.where(bmask, bslot, hslot0[cidx]))
            hfound2 = hfound.at[cidx].set(bfound | hfound[cidx])
            return key2, nbr2, hslot, hfound2

        def hclaim_full(_):
            key2, pslot = hclaim(hcoords, need)
            m2 = m._replace(key=key2)
            nbr2 = _claim_maintain_nbr(m2, hcoords, pslot)
            hslot, hfound2 = _locate(m2, hcoords)
            return key2, nbr2, hslot, hfound2

        if _CLAIM_CAP < hcoords.shape[0]:
            key2, nbr2, hslot, hfound2 = jax.lax.cond(
                jnp.sum(need) <= _CLAIM_CAP, hclaim_compact, hclaim_full,
                None)
        else:
            key2, nbr2, hslot, hfound2 = hclaim_full(None)
        m = m._replace(key=key2, nbr=nbr2)
        # write source planes into halo slots that hold no real points.
        # Multiple sources can target the same halo slot; a plain
        # duplicate-index scatter-set picks a platform-dependent winner
        # (CPU and TPU disagreed on 185 halo planes -> TPU-only LIO
        # divergence) and an arbitrary one is also wrong near creases.
        # Pick deterministically: the source whose plane best explains the
        # halo voxel's center.  (hslot/hfound2 come from the tiered
        # claim+relocate above.)
        src_plane6 = jnp.repeat(cleared, 6, axis=0)       # (6H, 6) rows
        writable = hmask & hfound2 & (m.mom[hslot, 0] == 0.0)

        def dedup_write(slot_r, plane_r, coords_r, mask_r):
            """Scored duplicate-target resolution + the final plane write
            over R candidate rows (R = full fan or a compacted subset —
            only mask_r rows compete, and stable compaction preserves
            their relative order, so the rank tie-break picks the same
            winner either way)."""
            widx2 = jnp.where(mask_r, slot_r, t)
            hcenter = _vox_center(coords_r, m.res)
            score = jnp.abs(
                jnp.sum(plane_r[:, :3] * hcenter, axis=-1) + plane_r[:, 3])
            score = jnp.where(mask_r, score, jnp.inf)
            best = jnp.full((t + 1,), jnp.inf, jnp.float32).at[widx2].min(
                score, mode="drop")
            is_best = mask_r & (score <= best[jnp.clip(widx2, 0, t - 1)])
            # exact-tie break on candidate rank: every platform writes the
            # same
            rank = jnp.arange(score.shape[0], dtype=jnp.int32)
            bidx = jnp.where(is_best, widx2, t)
            best_rank = jnp.full((t + 1,), _INT_MAX, jnp.int32).at[
                bidx].min(rank, mode="drop")
            win = is_best & (rank == best_rank[jnp.clip(bidx, 0, t - 1)])
            widx3 = jnp.where(win, widx2, t)
            # one packed scatter copies n, d, valid (dirty already 0).
            # re-anchoring the plane offset is unnecessary: adjacent voxels
            # of the same surface share the (n, d) parametrization exactly.
            return m._replace(
                plane=m.plane.at[widx3].set(plane_r, mode="drop"))

        def write_compact(_):
            # steady state: most fan rows target REAL neighbors (not
            # writable) — score/dedup/write only the writable subset
            cidx = _compact_idx(jnp.logical_not(writable), _CLAIM_CAP)
            return dedup_write(hslot[cidx], src_plane6[cidx],
                               hcoords[cidx], writable[cidx])

        def write_full(_):
            return dedup_write(hslot, src_plane6, hcoords, writable)

        if _CLAIM_CAP < hcoords.shape[0]:
            return jax.lax.cond(
                jnp.sum(writable) <= _CLAIM_CAP, write_compact, write_full,
                None)
        return write_full(None)

    # steady-state fast path: a converged map has no frontier and no dirty
    # planes -> the entire halo fan-out (locate x2 + claim rounds + scored
    # dedup writes) is skipped (identical semantics: with zero sources all
    # its scatters are no-ops)
    return jax.lax.cond(jnp.any(src_plane_ok), do_halo, lambda mm: mm, m)


@functools.partial(jax.jit, static_argnames=("window",))
def query_planes(m: SurfelMap, points: jax.Array, mask: jax.Array,
                 window: int = 3):
    """Per-point cached plane lookup with neighborhood fallback.

    window=1: own voxel only (ONE packed plane-row gather). window=3:
    consider all 27 neighboring voxels' cached planes and pick the one
    whose CENTROID is nearest (critical when the pose estimate lags and
    points land in not-yet-mapped voxels — the own-voxel-only variant
    silently loses exactly the residuals that would pull the estimate
    back; measured 2x worse drift on sparse scans).

    Returns (n (N,3), resid (N,), valid (N,)). resid = n.p + d."""
    coords = voxel_coords(points, m.res)
    if window == 1:
        slot, found = _locate_flat(m, coords)
        rows = m.plane[slot]                              # ONE gather
        n = rows[:, :3]
        d = rows[:, 3]
        valid = mask & found & (rows[:, 4] > 0.5)
        resid = jnp.sum(n * points, axis=-1) + d
        return (jnp.where(valid[:, None], n, 0.0),
                jnp.where(valid, resid, 0.0), valid)
    assert window == 3
    ncoords = coords[:, None, :] + _neighbor_offsets()[None]   # (N, 27, 3)
    slot, found = _locate(m, ncoords)                          # (N, 27)
    rows = m.plane[slot]                                       # (N, 27, 6)
    mom = m.mom[slot]                                          # (N, 27, 10)
    ok = found & (rows[..., 4] > 0.5) & mask[:, None]
    centroid = _vox_center(m.key[slot, :3], m.res) + (
        mom[..., 1:4] / jnp.maximum(mom[..., 0], 1.0)[..., None])
    c_d2 = jnp.sum((centroid - points[:, None, :]) ** 2, axis=-1)
    c_d2 = jnp.where(ok, c_d2, jnp.inf)
    j = jnp.argmin(c_d2, axis=-1)
    rows_b = jnp.take_along_axis(rows, j[:, None, None], axis=1)[:, 0]
    valid = jnp.isfinite(jnp.take_along_axis(c_d2, j[:, None], axis=1)[:, 0])
    n = rows_b[:, :3]
    d = rows_b[:, 3]
    resid = jnp.sum(n * points, axis=-1) + d
    return (jnp.where(valid[:, None], n, 0.0),
            jnp.where(valid, resid, 0.0), valid)


@jax.jit
def evict_beyond(m: SurfelMap, center: jax.Array,
                 radius: jax.Array) -> SurfelMap:
    """Drop voxels beyond the moving window (zero their moments so slots
    are reusable)."""
    mean = _vox_center(m.key[:, :3], m.res) + (
        m.mom[:, 1:4] / jnp.maximum(m.mom[:, 0], 1.0)[:, None])
    d2 = jnp.sum((mean - center[None]) ** 2, axis=-1)
    keep = (m.key[:, 3] > 0) & (d2 <= radius * radius)
    kf = keep.astype(jnp.float32)[:, None]
    return m._replace(
        key=m.key.at[:, 3].set(keep.astype(jnp.int32)),
        mom=m.mom * kf,
        plane=m.plane * kf,  # zeroes valid + dirty flags too
    )
