"""Voxel hash grid — the TPU-native spatial index.

One structure replaces three dynamic neighbor structures of the reference
stack (SURVEY §7 hard part (b)):

- FAST-LIO2's incremental **ikd-tree** local map [external] -> the LIO local
  map is a hash grid at ``filter_size_map`` resolution (iVox-style: one
  representative point per voxel, neighbor window gathers for plane fits);
- Nano-GICP's **NanoFLANN kd-tree** kNN (loop_closure.cpp:120-124 via
  calculate*Covariances/align) -> windowed kNN over the 0.3 m-voxelized
  clouds;
- PCL radius searches in Quatro's FPFH [external] -> windowed radius gather.

Design: open addressing with **double hashing** and NUM_PROBES probe slots
per voxel.  Insertion runs NUM_PROBES rounds of scatter-min (each unplaced
point bids for its next probe slot; lowest point index wins a free slot), so
placement is deterministic and fully data-parallel.  Queries gather all
NUM_PROBES slots per neighbor voxel and verify stored coords against the
expected key, so hash aliasing can never return a wrong point.  At load
factor <=0.25 the residual drop rate after 4 probe rounds is ~1e-4 (a
single-probe table drops ~12% — measured; hence the rounds).  Everything is
fixed-shape: no data-dependent sizes, one compiled program at any occupancy.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .voxel import voxel_coords

NUM_PROBES = 4
_INT_MAX = jnp.iinfo(jnp.int32).max


class HashGrid(NamedTuple):
    """Fixed-shape voxel hash table (a pytree; `res` is a static float)."""

    points: jax.Array    # (T, 3) f32 — representative point per voxel
    coords: jax.Array    # (T, 3) i32 — voxel coords for key verification
    occupied: jax.Array  # (T,) bool
    src_idx: jax.Array   # (T,) i32 — index of the winning source point
    res: float           # static voxel edge length

    @property
    def table_size(self) -> int:
        return self.points.shape[0]


def _hash2(coords: jax.Array):
    """Two independent 32-bit hashes of (..., 3) int voxel coords."""
    c = coords.astype(jnp.uint32)
    h1 = (
        c[..., 0] * jnp.uint32(0x8DA6B343)
        + c[..., 1] * jnp.uint32(0xD8163841)
        + c[..., 2] * jnp.uint32(0xCB1AB31F)
    )
    h1 ^= h1 >> 16
    h1 *= jnp.uint32(0x85EBCA6B)
    h1 ^= h1 >> 13
    h2 = (
        c[..., 0] * jnp.uint32(0x9E3779B1)
        + c[..., 1] * jnp.uint32(0x85EBCA77)
        + c[..., 2] * jnp.uint32(0xC2B2AE3D)
    )
    h2 ^= h2 >> 15
    h2 *= jnp.uint32(0x27D4EB2F)
    h2 ^= h2 >> 13
    return h1, h2


def _probe_slots(coords: jax.Array, table_size: int) -> jax.Array:
    """(..., 3) int coords -> (..., NUM_PROBES) int32 slot indices
    (double hashing: slot_p = h1 + p * (h2 | 1) mod T)."""
    h1, h2 = _hash2(coords)
    step = h2 | jnp.uint32(1)
    p = jnp.arange(NUM_PROBES, dtype=jnp.uint32)
    slots = (h1[..., None] + p * step[..., None]) & jnp.uint32(table_size - 1)
    return slots.astype(jnp.int32)


def _scatter_rounds(
    occupied, winner, coords, mask, table_size, already_present=None
):
    """Run NUM_PROBES rounds of slot bidding. Returns (occupied, winner,
    point_slot) where point_slot[i] is the slot point i won (or -1)."""
    n = coords.shape[0]
    slots = _probe_slots(coords, table_size)  # (n, P)
    idx = jnp.arange(n, dtype=jnp.int32)
    unplaced = mask
    if already_present is not None:
        unplaced = unplaced & ~already_present
    point_slot = jnp.full((n,), -1, jnp.int32)
    for p in range(NUM_PROBES):
        cand_slot = jnp.where(unplaced, slots[:, p], table_size)
        bids = jnp.full((table_size + 1,), _INT_MAX, jnp.int32)
        bids = bids.at[cand_slot].min(idx)
        bids = bids[:table_size]
        newly = (~occupied) & (bids != _INT_MAX)
        # point i placed iff it won a newly-claimed slot
        won = unplaced & (cand_slot < table_size)
        won = won & newly[jnp.clip(cand_slot, 0, table_size - 1)]
        won = won & (bids[jnp.clip(cand_slot, 0, table_size - 1)] == idx)
        point_slot = jnp.where(won, cand_slot, point_slot)
        occupied = occupied | newly
        # drop same-voxel siblings of this round's winners: identical coords
        # share the whole probe sequence, so a loser would claim the NEXT
        # probe slot in a later round and duplicate the voxel in the table
        # (inflating occupancy up to NUM_PROBES x and biasing kNN)
        slot_c = jnp.clip(cand_slot, 0, table_size - 1)
        win_at_slot = jnp.clip(bids[slot_c], 0, n - 1)
        lost_to_sibling = (
            unplaced & ~won & newly[slot_c]
            & jnp.all(coords[win_at_slot] == coords, axis=-1)
        )
        unplaced = unplaced & ~won & ~lost_to_sibling
    # record each winning bidder in its claimed slot with ONE scatter at the
    # end instead of one per round: a slot is claimed by at most one point
    # across all rounds (occupied afterwards, so never `newly` again), and
    # point_slot holds exactly that (point, slot) pairing — bit-identical to
    # the per-round scatter-min, at NUM_PROBES-1 fewer table scatters (TPU
    # scatters carry a large fixed op cost; this is the claim stage's
    # hottest axis).
    winner = winner.at[jnp.where(point_slot >= 0, point_slot, table_size)].min(
        jnp.where(point_slot >= 0, idx, _INT_MAX)
    )
    return occupied, winner, point_slot


@functools.partial(jax.jit, static_argnames=("res", "table_size", "dtype"))
def empty(res: float, table_size: int, dtype=jnp.float32) -> HashGrid:
    assert table_size & (table_size - 1) == 0, "table_size must be a power of 2"
    return HashGrid(
        points=jnp.zeros((table_size, 3), dtype),
        coords=jnp.zeros((table_size, 3), jnp.int32),
        occupied=jnp.zeros((table_size,), bool),
        src_idx=jnp.full((table_size,), -1, jnp.int32),
        res=res,
    )


@jax.jit
def contains(grid: HashGrid, coords: jax.Array) -> jax.Array:
    """(..., 3) int voxel coords -> bool: is this voxel in the table?"""
    slots = _probe_slots(coords, grid.table_size)  # (..., P)
    keys = grid.coords[slots]  # (..., P, 3)
    occ = grid.occupied[slots]
    return jnp.any(occ & jnp.all(keys == coords[..., None, :], axis=-1), axis=-1)


@jax.jit
def insert(grid: HashGrid, points: jax.Array, mask: jax.Array) -> HashGrid:
    """Insert points, keeping existing voxel occupants (FAST-LIO-style
    add-if-voxel-empty map update [external]). Same-voxel contenders within
    one batch: the winner is the new point with the lowest index whose probe
    round claims the slot first; remaining duplicates are dropped (their
    voxel is then present)."""
    t = grid.table_size
    coords = voxel_coords(points, grid.res)
    present = contains(grid, coords)
    occupied, winner0 = grid.occupied, jnp.full((t + 1,), _INT_MAX, jnp.int32)
    occupied, winner, point_slot = _scatter_rounds(
        occupied, winner0, coords, mask, t, already_present=present
    )
    winner = winner[:t]
    newly = winner != _INT_MAX
    widx = jnp.where(newly, winner, 0)
    return HashGrid(
        points=jnp.where(newly[:, None], points[widx], grid.points),
        coords=jnp.where(newly[:, None], coords[widx], grid.coords),
        occupied=occupied,
        src_idx=jnp.where(newly, winner, grid.src_idx),
        res=grid.res,
    )


@functools.partial(jax.jit, static_argnames=("res", "table_size"))
def build(points: jax.Array, mask: jax.Array, res: float, table_size: int) -> HashGrid:
    """Build a grid from a masked point set. table_size must be a power of
    2 and should be >= 4x the expected occupied-voxel count."""
    return insert(empty(res, table_size, points.dtype), points, mask)


@jax.jit
def evict_beyond(grid: HashGrid, center: jax.Array, radius: jax.Array) -> HashGrid:
    """Drop voxels farther than `radius` from `center` — the moving-window
    map maintenance replacing FAST-LIO's cube_side_length box pruning
    [external]; keeps table occupancy bounded on long trajectories."""
    d2 = jnp.sum((grid.points - center[None, :]) ** 2, axis=-1)
    keep = grid.occupied & (d2 <= radius * radius)
    return grid._replace(
        occupied=keep,
        src_idx=jnp.where(keep, grid.src_idx, -1),
    )


def _window_offsets(window: int) -> jax.Array:
    """(window^3, 3) int32 offsets, e.g. 27 for window=3."""
    r = jnp.arange(window, dtype=jnp.int32) - window // 2
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)


@functools.partial(jax.jit, static_argnames=("window",))
def gather_candidates(grid: HashGrid, queries: jax.Array, window: int = 3):
    """For each query, gather points of the window^3 neighboring voxels
    (all probe slots, key-verified).

    Returns (cand_pts (M, C, 3), cand_valid (M, C), cand_src (M, C)) with
    C = window^3 * NUM_PROBES.
    """
    base = voxel_coords(queries, grid.res)  # (M, 3)
    offs = _window_offsets(window)  # (W3, 3)
    ncoords = base[:, None, :] + offs[None, :, :]  # (M, W3, 3)
    slots = _probe_slots(ncoords, grid.table_size)  # (M, W3, P)
    pts = grid.points[slots]  # (M, W3, P, 3)
    keys = grid.coords[slots]
    valid = grid.occupied[slots] & jnp.all(keys == ncoords[:, :, None, :], axis=-1)
    m, w3 = valid.shape[0], valid.shape[1]
    c = w3 * NUM_PROBES
    return (
        pts.reshape(m, c, 3),
        valid.reshape(m, c),
        grid.src_idx[slots].reshape(m, c),
    )


@functools.partial(jax.jit, static_argnames=("window",))
def query_nn(grid: HashGrid, queries: jax.Array, qmask: jax.Array, window: int = 3):
    """Nearest neighbor within the window. Returns (nn_pts (M,3),
    nn_dist2 (M,), nn_src (M,), found (M,))."""
    pts, valid, src = gather_candidates(grid, queries, window)
    d2 = jnp.sum((pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    m = jnp.arange(queries.shape[0])
    best = d2[m, j]
    found = jnp.isfinite(best) & qmask
    return pts[m, j], jnp.where(found, best, jnp.inf), src[m, j], found


@functools.partial(jax.jit, static_argnames=("k", "window"))
def query_knn(
    grid: HashGrid, queries: jax.Array, qmask: jax.Array, k: int, window: int = 5
):
    """k nearest neighbors within the window.

    Returns (knn_pts (M,k,3), knn_dist2 (M,k), knn_valid (M,k)).
    Fewer than k in-window neighbors -> trailing invalid entries.
    """
    pts, valid, _ = gather_candidates(grid, queries, window)
    d2 = jnp.sum((pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid & qmask[:, None], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)  # (M, k)
    knn_d2 = -neg
    knn_valid = jnp.isfinite(knn_d2)
    knn_pts = jnp.take_along_axis(pts, idx[..., None], axis=1)
    return knn_pts, jnp.where(knn_valid, knn_d2, jnp.inf), knn_valid
