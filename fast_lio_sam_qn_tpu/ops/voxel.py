"""Fixed-shape voxel-grid downsampling (replaces pcl::VoxelGrid —
reference ``utilities.hpp:38-63``).

PCL's VoxelGrid emits one centroid per occupied voxel.  The TPU-native
equivalent is an exact, sort-based, fully static-shape program:

1. quantize points to integer voxel coords,
2. sort by a spatial hash of the coords (same-voxel points become contiguous;
   int32 hash collisions between distinct voxels are ~n^2/2^32 — vanishingly
   rare and benign: a collided voxel merely emits two centroids),
3. segment boundaries where the hash OR the coords change,
4. segment-sum -> centroids, and
5. stable-compact the segment heads to a fixed output capacity with a mask.

Everything is jit-compatible with static shapes; the number of occupied
voxels never appears as a shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def voxel_coords(points: jax.Array, res: float) -> jax.Array:
    """Integer voxel coordinates, floor(p / res). (..., 3) f32 -> int32."""
    return jnp.floor(points / res).astype(jnp.int32)


def spatial_hash(coords: jax.Array) -> jax.Array:
    """31-bit mixing hash of (..., 3) integer voxel coords.

    Additive combine with distinct odd multipliers + murmur3 finalizer.
    (The classic XOR-of-prime-products hash has sign-symmetry collisions —
    (x,y,z) and (-x,y,-z) style pairs collide — measured 10% collision rate
    on a small test cloud, so it is NOT used.)  Top bit cleared so
    jnp.iinfo(int32).max stays free as a sort sentinel.
    """
    c = coords.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(0x8DA6B343)
        + c[..., 1] * jnp.uint32(0xD8163841)
        + c[..., 2] * jnp.uint32(0xCB1AB31F)
    )
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return (h >> 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("res", "out_cap"))
def voxel_downsample(
    points: jax.Array,
    mask: jax.Array,
    res: float,
    out_cap: int | None = None,
    feats: jax.Array | None = None,
):
    """Centroid-per-voxel downsample.

    Args:
      points: (N, 3) f32, padded.
      mask:   (N,) bool validity.
      res:    voxel edge length (static).
      out_cap: output capacity (static; default N). If the number of occupied
        voxels exceeds out_cap, lowest-hash voxels win (deterministic).
      feats: optional (N, C) per-point features (e.g. intensity) averaged
        per voxel alongside the centroid — pcl::VoxelGrid averages the full
        PointXYZI, intensity included (utilities.hpp:38-63).

    Returns:
      (out_points (out_cap, 3) f32, out_mask (out_cap,) bool)
      [, out_feats (out_cap, C) when feats is given]
    """
    n = points.shape[0]
    out_cap = out_cap or n
    data = points if feats is None else jnp.concatenate(
        [points, feats.astype(points.dtype)], axis=-1)
    coords = voxel_coords(points, res)
    h = spatial_hash(coords)
    # push invalid points to the end of the sort with a sentinel key
    key = jnp.where(mask, h, jnp.iinfo(jnp.int32).max)
    # lexicographic (hash, coords) sort, stable: hash alone is 31-bit, so
    # two DISTINCT voxels can collide (~n^2/2^31 pairs per cloud) and a
    # hash-only sort preserves their interleaved input order — the
    # coords-change head detection below then splits one voxel into
    # multiple segments (duplicate centroids). Sorting on coords within
    # equal hashes groups colliding voxels contiguously; stability keeps
    # within-voxel input order (deterministic representatives).
    order = jnp.lexsort(
        (coords[:, 2], coords[:, 1], coords[:, 0], key))
    data_s = data[order]
    coords_s = coords[order]
    key_s = key[order]
    mask_s = mask[order]

    prev_key = jnp.concatenate([key_s[:1] - 1, key_s[:-1]])
    prev_coords = jnp.concatenate([coords_s[:1] + 1, coords_s[:-1]])
    is_head = (key_s != prev_key) | jnp.any(coords_s != prev_coords, axis=-1)
    is_head = is_head & mask_s

    seg_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # -1 before first head
    seg_id = jnp.maximum(seg_id, 0)
    w = mask_s.astype(points.dtype)
    seg_sum = jax.ops.segment_sum(data_s * w[:, None], seg_id, num_segments=n)
    seg_cnt = jax.ops.segment_sum(w, seg_id, num_segments=n)
    centroid = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None]

    head_centroids = centroid[seg_id]  # valid where is_head
    # stable-compact heads to the front: sort by (!is_head) keeps head order
    compact_order = jnp.argsort(jnp.logical_not(is_head), stable=True)
    out_full = head_centroids[compact_order]
    out_mask_full = is_head[compact_order]
    if out_cap <= n:
        out_full = out_full[:out_cap]
        out_mask_full = out_mask_full[:out_cap]
    else:
        pad = out_cap - n
        out_full = jnp.pad(out_full, ((0, pad), (0, 0)))
        out_mask_full = jnp.pad(out_mask_full, (0, pad))
    if feats is None:
        return out_full, out_mask_full
    return out_full[:, :3], out_mask_full, out_full[:, 3:]
