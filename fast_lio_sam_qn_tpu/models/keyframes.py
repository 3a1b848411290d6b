"""Device-resident keyframe store — the PosePcd vector replacement.

The reference keeps ``std::vector<PosePcd>`` (pose_pcd.hpp:7-43) guarded by
keyframes_mutex_ and grows it unboundedly.  Here keyframes live in fixed-
capacity device arrays (SURVEY §5 long-context note: padded ring with a
count + masked reductions), single-writer by construction — the mutex
quartet disappears.

Clouds are stored in the BODY (LiDAR) frame like the reference (which
un-transforms FAST-LIO's world-frame output, pose_pcd.hpp:39-40), already
voxelized at the matching resolution; raw clouds for byte-accurate export
stay in the host archive (utils/io.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KeyframeStore(NamedTuple):
    clouds: jax.Array        # (K, P, 3) body-frame, voxelized
    cloud_masks: jax.Array   # (K, P)
    intensities: jax.Array   # (K, P) per-point intensity (PointXYZI parity,
                             # utilities.hpp:36; zeros for sources without)
    poses: jax.Array         # (K, 4, 4) raw odometry poses
    poses_corrected: jax.Array  # (K, 4, 4) PGO-corrected poses
    timestamps: jax.Array    # (K,)
    count: jax.Array         # () int32

    @property
    def capacity(self) -> int:
        return self.clouds.shape[0]

    @property
    def points_per_frame(self) -> int:
        return self.clouds.shape[1]


def empty_store(max_keyframes: int, points_per_frame: int,
                dtype=jnp.float32) -> KeyframeStore:
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_keyframes, 4, 4))
    return KeyframeStore(
        clouds=jnp.zeros((max_keyframes, points_per_frame, 3), dtype),
        cloud_masks=jnp.zeros((max_keyframes, points_per_frame), bool),
        intensities=jnp.zeros((max_keyframes, points_per_frame), dtype),
        poses=eye,
        poses_corrected=eye,
        timestamps=jnp.zeros((max_keyframes,), dtype),
        count=jnp.int32(0),
    )


@jax.jit
def append(store: KeyframeStore, cloud, cloud_mask, pose, pose_corrected,
           timestamp, intensity=None) -> KeyframeStore:
    i = store.count
    if intensity is None:
        intensity = jnp.zeros(cloud.shape[0], cloud.dtype)
    return store._replace(
        clouds=store.clouds.at[i].set(cloud),
        cloud_masks=store.cloud_masks.at[i].set(cloud_mask),
        intensities=store.intensities.at[i].set(intensity),
        poses=store.poses.at[i].set(pose),
        poses_corrected=store.poses_corrected.at[i].set(pose_corrected),
        timestamps=store.timestamps.at[i].set(timestamp),
        count=i + 1,
    )


def grow(store: KeyframeStore, new_capacity: int) -> KeyframeStore:
    """Re-pad the store to a larger capacity (amortized growth on overflow
    — SURVEY §5: the reference's std::vector grows unboundedly,
    fast_lio_sam_qn.cpp:127-130; here growth costs one recompile of the
    consumers at the new static shape)."""
    if new_capacity <= store.capacity:
        return store
    pad = new_capacity - store.capacity
    eye = jnp.broadcast_to(
        jnp.eye(4, dtype=store.poses.dtype), (pad, 4, 4))
    return store._replace(
        clouds=jnp.concatenate(
            [store.clouds,
             jnp.zeros((pad,) + store.clouds.shape[1:], store.clouds.dtype)]),
        cloud_masks=jnp.concatenate(
            [store.cloud_masks,
             jnp.zeros((pad,) + store.cloud_masks.shape[1:], bool)]),
        intensities=jnp.concatenate(
            [store.intensities,
             jnp.zeros((pad,) + store.intensities.shape[1:],
                       store.intensities.dtype)]),
        poses=jnp.concatenate([store.poses, eye]),
        poses_corrected=jnp.concatenate([store.poses_corrected, eye]),
        timestamps=jnp.concatenate(
            [store.timestamps, jnp.zeros((pad,), store.timestamps.dtype)]),
        count=store.count,
    )


@jax.jit
def rewrite_corrected(store: KeyframeStore, poses: jax.Array) -> KeyframeStore:
    """Bulk-overwrite corrected poses from the PGO estimate — the reference's
    O(N) keyframe rewrite after a loop (fast_lio_sam_qn.cpp:180-188), here a
    single masked copy."""
    active = (jnp.arange(store.capacity) < store.count)[:, None, None]
    return store._replace(
        poses_corrected=jnp.where(active, poses[: store.capacity],
                                  store.poses_corrected)
    )
