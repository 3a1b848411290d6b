"""Surfel voxel map — accumulated per-voxel moments with cached planes.

The second-generation LIO local map (first: ops/hashgrid.py's 1-point-per-
voxel grid). Instead of storing representative points and re-running kNN +
plane fits per query point per IESEKF iteration, each voxel accumulates the
FULL second-order moments (count, sum, outer-product sum) of every point
ever inserted — pure scatter-adds, the friendliest possible op shape for
XLA — and caches a fitted plane (normal, offset, validity) computed from
its 3^3 neighborhood's combined moments at insert time.

Queries then cost ONE probed lookup per point: gather (n, d, valid) and the
point-to-plane residual is n.p + d. The expensive work (neighborhood moment
gathers + batched 3x3 eigendecompositions) runs once per scan over the
TOUCHED voxels only, instead of 3x per scan over every scan point.

Accuracy note: planes fit over accumulated moments of a 1.5 x res
neighborhood — a true surfel map (cf. VoxelMap / PV-LIO [external]) rather
than FAST-LIO's 5-NN instantaneous fits; neighbors' cached planes go
slightly stale until they are next touched (documented approximation; the
map converges over scans, much like ikd-tree's amortized rebalancing).
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
    coords: jax.Array      # (T, 3) i32 voxel coords (key verification)
    occupied: jax.Array    # (T,) bool
    count: jax.Array       # (T,) f32 — accumulated point count
    psum: jax.Array        # (T, 3) f32 — sum of (p - voxel_center)
    m2: jax.Array          # (T, 3, 3) f32 — sum of centered outer products
    plane_n: jax.Array     # (T, 3) cached plane normal
    plane_d: jax.Array     # (T,) cached plane offset (n.x + d = 0)
    plane_valid: jax.Array  # (T,)
    halo_dirty: jax.Array  # (T,) plane changed since last halo propagation
    res: float             # static voxel edge

    @property
    def table_size(self) -> int:
        return self.coords.shape[0]


# a refit marks a voxel halo-dirty when its plane moved by more than these
# (normal angle ~3 deg, offset 2 cm) — halo propagation then refreshes the
# voxel's face neighbors and clears the bit
_HALO_COS_TOL = 0.9986
_HALO_D_TOL = 0.02


@functools.partial(jax.jit, static_argnames=("res", "table_size"))
def empty(res: float, table_size: int) -> SurfelMap:
    assert table_size & (table_size - 1) == 0
    return SurfelMap(
        coords=jnp.zeros((table_size, 3), jnp.int32),
        occupied=jnp.zeros((table_size,), bool),
        count=jnp.zeros((table_size,), jnp.float32),
        psum=jnp.zeros((table_size, 3), jnp.float32),
        m2=jnp.zeros((table_size, 3, 3), jnp.float32),
        plane_n=jnp.zeros((table_size, 3), jnp.float32),
        plane_d=jnp.zeros((table_size,), jnp.float32),
        plane_valid=jnp.zeros((table_size,), bool),
        halo_dirty=jnp.zeros((table_size,), bool),
        res=res,
    )


def _vox_center(coords: jax.Array, res: float) -> jax.Array:
    """World-space center of each voxel. Moments are accumulated RELATIVE
    to this center so every stored quantity has magnitude <= res/2: the
    naive cov = E[ppT] - mean meanT form cancels ~|mean|^2 (~100s of m^2)
    against itself to recover a plane variance of ~1e-3 m^2, which in f32
    leaves platform-dependent noise bigger than the signal (TPU and CPU
    disagreed on ~6% of fitted normals; the LIO diverged on TPU only)."""
    return (coords.astype(jnp.float32) + 0.5) * res


def _locate(m: SurfelMap, coords: jax.Array):
    """(..., 3) coords -> (slot (...,), found (...,)) via verified probes."""
    slots = _probe_slots(coords, m.table_size)             # (..., P)
    keys = m.coords[slots]                                 # (..., P, 3)
    hit = m.occupied[slots] & jnp.all(keys == coords[..., None, :], -1)
    first = jnp.argmax(hit, axis=-1)
    found = jnp.any(hit, axis=-1)
    slot = jnp.take_along_axis(slots, first[..., None], axis=-1)[..., 0]
    return jnp.where(found, slot, 0), found


def _neighbor_offsets():
    import numpy as _np

    r = _np.arange(-1, 2, dtype=_np.int32)
    ox, oy, oz = _np.meshgrid(r, r, r, indexing="ij")
    return jnp.asarray(
        _np.stack([ox.ravel(), oy.ravel(), oz.ravel()], -1))


def _hood_offsets(window: int):
    """Neighborhood offsets for the hood refit. 27 = full 3^3; 7 = center +
    six faces (4x less gather traffic — the dominant insert cost at
    production scan sizes; the face hood still pools moments across the
    local surface, it only drops the corner/edge diagonals)."""
    if window == 27:
        return _neighbor_offsets()
    assert window == 7
    return jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
         [0, 0, 1], [0, 0, -1]], jnp.int32)


def _plane_from(cnt, psum, m2, center):
    """Fit (n, d, thickness, spread) from center-relative moments.

    Moments MUST be relative to `center` (see _vox_center): the covariance
    subtraction is then between ~res-sized quantities, platform-stable in
    f32. `spread` = sqrt(mid eigenvalue) — a valid plane needs BOTH a thin
    normal direction AND real in-plane spread: points on a line/edge have
    lam0 ~ lam1 ~ 0, pass any thickness gate, and get an arbitrary
    (platform-lottery) normal — measured: 2% of voxels, enough to diverge
    the IESEKF on TPU while the same run converged on CPU."""
    mean = psum / jnp.maximum(cnt, 1.0)[:, None]          # center-rel
    cov = m2 / jnp.maximum(cnt, 1.0)[:, None, None] - jnp.einsum(
        "si,sj->sij", mean, mean, precision="highest")
    vals, vecs = linalg3.eigh3(cov)
    n = vecs[..., :, 0]
    d = -jnp.sum(n * (center + mean), axis=-1)
    thick = jnp.sqrt(jnp.maximum(vals[..., 0], 0.0))
    spread = jnp.sqrt(jnp.maximum(vals[..., 1], 0.0))     # in-plane
    return n, d, thick, spread


@functools.partial(
    jax.jit, static_argnames=("min_pts", "hood_cap", "hood_window"))
def _refit_planes(m: SurfelMap, slots: jax.Array, slot_valid: jax.Array,
                  thickness: jax.Array, min_pts: int = 6,
                  hood_cap: int | None = None,
                  hood_window: int = 27) -> SurfelMap:
    """Recompute cached planes for the given slots.

    Two-phase adaptive fit:
    1. OWN-moments fit for every slot (cheap: only the slot's own fields) —
       preferred when the voxel is well-populated and tight (sharper at
       creases, where the 3-voxel hood mixes two surfaces; a handful of
       volume-scattered points is often accidentally planar, hence the
       3*min_pts population gate);
    2. 3^3-neighborhood-moments fit ONLY for the slots whose own fit did
       not qualify, compacted to a static `hood_cap` — the hood gathers
       (27 voxels x NUM_PROBES probes x 13 floats per slot) dominate insert
       cost at production scan sizes. Immature slots beyond the cap keep
       their previous plane until next touched (amortized refresh, akin to
       ikd-tree's deferred rebalancing).
    hood_cap=None processes all slots through the hood path (exact)."""
    s_rows = slots.shape[0]
    min_spread = 0.5 * thickness
    cnt_o = m.count[slots]
    center_o = _vox_center(m.coords[slots], m.res)
    n_o, d_o, th_o, sp_o = _plane_from(
        cnt_o, m.psum[slots], m.m2[slots], center_o)
    use_own = (cnt_o >= 3 * min_pts) & (th_o < thickness) & (
        sp_o > min_spread)

    # previous planes (for halo-dirty change detection, sign-aligned since
    # (n, d) and (-n, -d) are the same plane)
    n_prev, d_prev = m.plane_n[slots], m.plane_d[slots]
    v_prev = m.plane_valid[slots]

    def _changed(n_new, d_new):
        dot = jnp.sum(n_new * n_prev, axis=-1)
        s = jnp.where(dot < 0, -1.0, 1.0)
        return (~v_prev | (jnp.abs(dot) < _HALO_COS_TOL)
                | (jnp.abs(d_new - s * d_prev) > _HALO_D_TOL))

    # phase 1: scatter own-fit planes
    own_rows = slot_valid & use_own
    safe_o = jnp.where(own_rows, slots, m.table_size)
    plane_n = m.plane_n.at[safe_o].set(n_o, mode="drop")
    plane_d = m.plane_d.at[safe_o].set(d_o, mode="drop")
    plane_valid = m.plane_valid.at[safe_o].set(own_rows, mode="drop")
    dirty_o = own_rows & _changed(n_o, d_o)
    halo_dirty = m.halo_dirty.at[
        jnp.where(dirty_o, slots, m.table_size)].set(True, mode="drop")

    # phase 2: hood fit for the rest (compacted when capped)
    need_hood = slot_valid & ~use_own
    if hood_cap is not None and hood_cap < s_rows:
        order = jnp.argsort(jnp.logical_not(need_hood), stable=True)
        h_slots = slots[order][:hood_cap]
        h_valid = need_hood[order][:hood_cap]
    else:
        h_slots = slots
        h_valid = need_hood
    coords = m.coords[h_slots]
    offs = _hood_offsets(hood_window)

    def do_hood(args):
        plane_n, plane_d, plane_valid, halo_dirty = args
        ncoords = coords[:, None, :] + offs[None]             # (H, W, 3)
        nslot, nfound = _locate(m, ncoords)
        w = (nfound & h_valid[:, None]).astype(jnp.float32)
        # neighbor moments are relative to THEIR center; shift to the
        # central voxel's center (delta = offset * res, exact in f32)
        # before combining. All magnitudes stay <= 1.5*res: no
        # cancellation, platform-stable.
        delta = offs.astype(jnp.float32) * m.res              # (W, 3)
        cnt_j = m.count[nslot] * w                            # (H, W)
        psum_j = m.psum[nslot] * w[..., None]                 # (H, W, 3)
        m2_j = m.m2[nslot] * w[..., None, None]               # (H, W, 3, 3)
        dp = delta[None, :, :, None] * psum_j[:, :, None, :]  # d_a * p_b
        dd = delta[:, :, None] * delta[:, None, :]            # (W, 3, 3)
        cnt = jnp.sum(cnt_j, axis=1)                          # (H,)
        psum = jnp.sum(psum_j + cnt_j[..., None] * delta[None], axis=1)
        m2 = jnp.sum(
            m2_j + dp + jnp.swapaxes(dp, -1, -2)
            + cnt_j[..., None, None] * dd[None], axis=1)      # (H, 3, 3)
        center_h = _vox_center(coords, m.res)
        n_h, d_h, th_h, sp_h = _plane_from(cnt, psum, m2, center_h)
        h_ok = (cnt >= min_pts) & (th_h < thickness) & (sp_h > min_spread)
        safe_h = jnp.where(h_valid, h_slots, m.table_size)
        plane_n = plane_n.at[safe_h].set(n_h, mode="drop")
        plane_d = plane_d.at[safe_h].set(d_h, mode="drop")
        plane_valid = plane_valid.at[safe_h].set(h_valid & h_ok,
                                                 mode="drop")
        # hood-phase dirty: previous planes gathered at the compacted rows
        np_h, dp_h = m.plane_n[h_slots], m.plane_d[h_slots]
        vp_h = m.plane_valid[h_slots]
        dot_h = jnp.sum(n_h * np_h, axis=-1)
        s_h = jnp.where(dot_h < 0, -1.0, 1.0)
        dirty_h = h_valid & h_ok & (
            ~vp_h | (jnp.abs(dot_h) < _HALO_COS_TOL)
            | (jnp.abs(d_h - s_h * dp_h) > _HALO_D_TOL))
        halo_dirty = halo_dirty.at[
            jnp.where(dirty_h, h_slots, m.table_size)].set(True,
                                                           mode="drop")
        return plane_n, plane_d, plane_valid, halo_dirty

    # steady-state fast path: no immature voxels this scan -> skip the
    # whole hood gather/fit block (identical semantics: with zero valid
    # rows every hood scatter is a no-op)
    plane_n, plane_d, plane_valid, halo_dirty = jax.lax.cond(
        jnp.any(h_valid), do_hood, lambda a: a,
        (plane_n, plane_d, plane_valid, halo_dirty))
    return m._replace(plane_n=plane_n, plane_d=plane_d,
                      plane_valid=plane_valid, halo_dirty=halo_dirty)


@functools.partial(jax.jit, static_argnames=(
    "hood_cap", "halo", "halo_cap", "hood_window"))
def insert(m: SurfelMap, points: jax.Array, mask: jax.Array,
           thickness: jax.Array, hood_cap: int | None = None,
           halo: bool = True, halo_cap: int | None = None,
           hood_window: int = 27) -> SurfelMap:
    """Accumulate points into voxel moments and refresh the touched voxels'
    cached planes. One scatter-heavy program per scan. hood_cap bounds the
    expensive neighborhood-refit list and halo_cap the halo-propagation
    source list (see _refit_planes / step 4); hood_window = 27 (full 3^3)
    or 7 (face hood, ~4x cheaper refit gathers). halo=False skips the
    halo-plane propagation (step 4) — ablation/profiling only."""
    t = m.table_size
    coords = voxel_coords(points, m.res)

    # 1. locate existing voxels; claim slots for new ones. Steady-state
    # scans mostly touch EXISTING voxels, so the whole claim machinery (4
    # scatter-min rounds over the table + a re-locate) is skipped via
    # lax.cond when every masked point is already present — the
    # data-adaptive fast path (ikd-tree-like amortization; semantics are
    # identical because with zero claimable points every claim scatter is
    # a no-op).
    slot, found = _locate(m, coords)
    need_claim = jnp.any(mask & ~found)

    def do_claim(_):
        occ0 = m.occupied
        w0 = jnp.full((t + 1,), _INT_MAX, jnp.int32)
        occ1, winner, _ = _scatter_rounds(
            occ0, w0, coords, mask, t, already_present=found)
        winner = winner[:t]
        newly = winner != _INT_MAX
        widx = jnp.where(newly, winner, 0)
        new_coords = jnp.where(newly[:, None], coords[widx], m.coords)
        m1 = m._replace(coords=new_coords, occupied=occ1)
        # points that landed in a claimed-new slot get that slot
        slot2, found2 = _locate(m1, coords)
        return new_coords, occ1, slot2, found2

    def skip_claim(_):
        return m.coords, m.occupied, slot, found

    new_coords, occupied, slot2, found2 = jax.lax.cond(
        need_claim, do_claim, skip_claim, None)
    m = m._replace(coords=new_coords, occupied=occupied)
    use = mask & found2
    sidx = jnp.where(use, slot2, t)  # dump row

    # 2. scatter-add center-relative moments (see _vox_center for why)
    cnt_before = m.count[jnp.clip(sidx, 0, t - 1)]  # 0: new or halo-only
    w = use.astype(jnp.float32)
    rel = points - _vox_center(coords, m.res)
    count = jnp.zeros((t + 1,), jnp.float32).at[sidx].add(w)[:t]
    psum = jnp.zeros((t + 1, 3), jnp.float32).at[sidx].add(
        rel * w[:, None])[:t]
    outer = jnp.einsum("ni,nj->nij", rel, rel, precision="highest")
    m2 = jnp.zeros((t + 1, 3, 3), jnp.float32).at[sidx].add(
        outer * w[:, None, None])[:t]
    m = m._replace(count=m.count + count, psum=m.psum + psum, m2=m.m2 + m2)

    # 3. refit planes of touched voxels (one slot per unique touched voxel;
    # duplicates refit redundantly but harmlessly)
    valid_before = m.plane_valid[jnp.clip(sidx, 0, t - 1)]  # pre-refit
    m = _refit_planes(m, jnp.clip(sidx, 0, t - 1), use, thickness,
                      hood_cap=hood_cap, hood_window=hood_window)

    if not halo:
        return m

    # 4. halo: propagate each touched voxel's plane into its UNMAPPED face
    # neighbors (count==0). Points from a lagging pose estimate land one
    # voxel outside the mapped surface; without a plane there, the update
    # never sees the residuals that would pull the estimate back (measured
    # 2x worse drift). Halo planes cost zero extra gathers at query time
    # and are overwritten by real fits once points arrive.
    face = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
         [0, 0, -1]], jnp.int32)
    n_pts = points.shape[0]
    # halo sources = the FRONTIER (voxels receiving their first points —
    # cnt_before==0 covers newly-claimed slots AND halo-only slots
    # materializing, which must keep extending the halo outward — plus
    # planes that just turned valid) UNION touched voxels whose plane is
    # HALO-DIRTY (changed since its last propagation — set by _refit_planes
    # when a refit moves the plane past _HALO_COS_TOL/_HALO_D_TOL). Early
    # on, planes churn and most touched voxels re-propagate (freezing halos
    # at creation quality measurably degrades the IESEKF: sim ATE 0.22 ->
    # 0.47 with 0/13 loops accepted); once the map converges the dirty set
    # — and the halo cost — shrinks toward zero. Re-fanning ALL 6*n_pts
    # faces every scan is the naive extreme (~20 ms of the 74 ms insert at
    # 32k points). Dirty sources beyond halo_cap keep their bit and retry
    # next scan.
    valid_after = m.plane_valid[jnp.clip(sidx, 0, t - 1)]
    frontier = (cnt_before == 0.0) | (valid_after & ~valid_before)
    dirty = m.halo_dirty[jnp.clip(sidx, 0, t - 1)]
    src_plane_ok = use & valid_after & (frontier | dirty)
    halo_cap = min(n_pts, (halo_cap or n_pts))
    if halo_cap < n_pts:
        # priority: frontier first, dirty refresh second
        prio = jnp.where(use & valid_after & frontier, 0,
                         jnp.where(src_plane_ok, 1, 2)).astype(jnp.int32)
        horder = jnp.argsort(prio, stable=True)
        h_src_coords = coords[horder][:halo_cap]
        h_src_sidx = sidx[horder][:halo_cap]
        src_plane_ok = src_plane_ok[horder][:halo_cap]
    else:
        h_src_coords = coords
        h_src_sidx = sidx
    def do_halo(m: SurfelMap) -> SurfelMap:
        # propagated sources are now in sync with their halos
        m = m._replace(halo_dirty=m.halo_dirty.at[
            jnp.where(src_plane_ok, jnp.clip(h_src_sidx, 0, t - 1), t)
        ].set(False, mode="drop"))
        hcoords = (h_src_coords[:, None, :] + face[None]).reshape(
            halo_cap * 6, 3)
        hmask = jnp.repeat(src_plane_ok, 6)
        _, hfound = _locate(m, hcoords)
        occupied2 = m.occupied
        winner0 = jnp.full((t + 1,), _INT_MAX, jnp.int32)
        occupied2, hwinner, _ = _scatter_rounds(
            occupied2, winner0, hcoords, hmask, t, already_present=hfound)
        hwinner = hwinner[:t]
        hnew = hwinner != _INT_MAX
        hidx = jnp.where(hnew, hwinner, 0)
        m = m._replace(
            coords=jnp.where(hnew[:, None], hcoords[hidx], m.coords),
            occupied=occupied2,
        )
        # write source planes into halo slots that hold no real points.
        # Multiple sources can target the same halo slot; a plain
        # duplicate-index scatter-set picks a platform-dependent winner
        # (CPU and TPU disagreed on 185 halo planes -> TPU-only LIO
        # divergence) and an arbitrary one is also wrong near creases.
        # Pick deterministically: the source whose plane best explains the
        # halo voxel's center.
        hslot, hfound2 = _locate(m, hcoords)
        src_slot = jnp.repeat(jnp.clip(h_src_sidx, 0, t - 1), 6)
        writable = hmask & hfound2 & (m.count[hslot] == 0.0)
        widx2 = jnp.where(writable, hslot, t)
        hcenter = _vox_center(hcoords, m.res)
        score = jnp.abs(
            jnp.sum(m.plane_n[src_slot] * hcenter, axis=-1)
            + m.plane_d[src_slot])
        score = jnp.where(writable, score, jnp.inf)
        best = jnp.full((t + 1,), jnp.inf, jnp.float32).at[widx2].min(
            score, mode="drop")
        is_best = writable & (score <= best[jnp.clip(widx2, 0, t - 1)])
        # exact-tie break on candidate rank: every platform writes the same
        rank = jnp.arange(score.shape[0], dtype=jnp.int32)
        bidx = jnp.where(is_best, widx2, t)
        best_rank = jnp.full((t + 1,), _INT_MAX, jnp.int32).at[bidx].min(
            rank, mode="drop")
        win = is_best & (rank == best_rank[jnp.clip(bidx, 0, t - 1)])
        widx3 = jnp.where(win, widx2, t)
        return m._replace(
            plane_n=m.plane_n.at[widx3].set(m.plane_n[src_slot],
                                            mode="drop"),
            plane_d=m.plane_d.at[widx3].set(
                # re-anchoring the plane offset is unnecessary: adjacent
                # voxels of the same surface share (n, d) exactly
                m.plane_d[src_slot], mode="drop"),
            plane_valid=m.plane_valid.at[widx3].set(
                m.plane_valid[src_slot], mode="drop"),
        )

    # steady-state fast path: a converged map has no frontier and no dirty
    # planes -> the entire halo fan-out (locate x2 + claim rounds + scored
    # dedup writes) is skipped (identical semantics: with zero sources all
    # its scatters are no-ops)
    return jax.lax.cond(jnp.any(src_plane_ok), do_halo, lambda mm: mm, m)


@functools.partial(jax.jit, static_argnames=("window",))
def query_planes(m: SurfelMap, points: jax.Array, mask: jax.Array,
                 window: int = 3):
    """Per-point cached plane lookup with neighborhood fallback.

    window=1: own voxel only. window=3: consider all 27 neighboring voxels'
    cached planes and pick the one whose CENTROID is nearest (critical when
    the pose estimate lags and points land in not-yet-mapped voxels — the
    own-voxel-only variant silently loses exactly the residuals that would
    pull the estimate back; measured 2x worse drift on sparse scans).

    Returns (n (N,3), resid (N,), valid (N,)). resid = n.p + d."""
    coords = voxel_coords(points, m.res)
    if window == 1:
        slot, found = _locate(m, coords)
        n = m.plane_n[slot]
        d = m.plane_d[slot]
        valid = mask & found & m.plane_valid[slot]
        resid = jnp.sum(n * points, axis=-1) + d
        return (jnp.where(valid[:, None], n, 0.0),
                jnp.where(valid, resid, 0.0), valid)
    assert window == 3
    ncoords = coords[:, None, :] + _neighbor_offsets()[None]   # (N, 27, 3)
    slot, found = _locate(m, ncoords)                          # (N, 27)
    ok = found & m.plane_valid[slot] & mask[:, None]
    centroid = _vox_center(m.coords[slot], m.res) + (
        m.psum[slot] / jnp.maximum(m.count[slot], 1.0)[..., None])
    c_d2 = jnp.sum((centroid - points[:, None, :]) ** 2, axis=-1)
    c_d2 = jnp.where(ok, c_d2, jnp.inf)
    j = jnp.argmin(c_d2, axis=-1)
    rows = jnp.arange(points.shape[0])
    best_slot = slot[rows, j]
    valid = jnp.isfinite(c_d2[rows, j])
    n = m.plane_n[best_slot]
    d = m.plane_d[best_slot]
    resid = jnp.sum(n * points, axis=-1) + d
    return (jnp.where(valid[:, None], n, 0.0),
            jnp.where(valid, resid, 0.0), valid)


@jax.jit
def evict_beyond(m: SurfelMap, center: jax.Array,
                 radius: jax.Array) -> SurfelMap:
    """Drop voxels beyond the moving window (zero their moments so slots
    are reusable)."""
    mean = _vox_center(m.coords, m.res) + (
        m.psum / jnp.maximum(m.count, 1.0)[:, None])
    d2 = jnp.sum((mean - center[None]) ** 2, axis=-1)
    keep = m.occupied & (d2 <= radius * radius)
    z = ~keep
    return m._replace(
        occupied=keep,
        count=jnp.where(z, 0.0, m.count),
        psum=jnp.where(z[:, None], 0.0, m.psum),
        m2=jnp.where(z[:, None, None], 0.0, m.m2),
        plane_valid=keep & m.plane_valid,
        halo_dirty=keep & m.halo_dirty,
    )
