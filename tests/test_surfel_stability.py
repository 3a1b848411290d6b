"""Regression tests for the platform-stability hardening of the surfel map.

These encode the three divergence classes that made the identical LIO
program converge on CPU (ATE 0.25 m) and diverge on TPU (ATE 75255 m);
see PARITY.md "Platform-stability hardening". They run on the CPU test
mesh but fail on ANY backend if the guarantees regress:

1. center-relative moments — plane fits stay accurate far from the origin
   (raw world-frame moments cancel |mean|^2 in f32 and lose the plane);
2. eigen-gap gate — points on a line have an ill-defined normal and must
   not produce valid planes (lam0 ~ lam1 ~ 0 passes any thickness gate);
3. deterministic halo winner — a contended halo slot gets the source
   plane that best explains the halo voxel center, not a platform-lottery
   duplicate-scatter winner.
"""
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import surfel_map


def test_plane_accuracy_far_from_origin():
    """A wall at |p| ~ 400 m fits as tightly as one at the origin.

    With raw (world-frame) second moments, cov = E[pp^T] - mean mean^T
    cancels ~1.6e5 m^2 against itself to recover ~1e-4 m^2 of plane
    variance — f32 noise swamps the signal and normals go random."""
    rng = np.random.default_rng(0)
    off = np.array([400.0, -300.0, 50.0], np.float32)
    xy = rng.uniform(-3, 3, (2000, 2)).astype(np.float32)
    pts = np.concatenate(
        [xy, rng.normal(0, 0.01, (2000, 1)).astype(np.float32)], -1) + off
    m = surfel_map.empty(res=0.5, table_size=1 << 12)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(2000, bool),
                          thickness=jnp.float32(0.1))
    q = jnp.asarray(pts[:200])
    n, resid, valid = surfel_map.query_planes(m, q, jnp.ones(200, bool))
    v = np.asarray(valid)
    assert v.mean() > 0.9, v.mean()
    nz = np.abs(np.asarray(n)[v][:, 2])
    assert (nz > 0.99).all(), nz.min()
    assert np.abs(np.asarray(resid)[v]).max() < 0.05


def test_line_of_points_has_no_valid_plane():
    """Points along a 1D line: lam0 ~ lam1 ~ 0 so sqrt(lam0) passes any
    thickness gate, but the normal is ill-defined — the in-plane-spread
    gate must reject these voxels."""
    t = np.linspace(-4, 4, 3000, dtype=np.float32)
    pts = np.stack([t, 0.2 * t, np.full_like(t, 1.0)], -1)
    m = surfel_map.empty(res=0.5, table_size=1 << 12)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(3000, bool),
                          thickness=jnp.float32(0.1))
    _, _, valid = surfel_map.query_planes(
        m, jnp.asarray(pts[::15]), jnp.ones(200, bool), window=1)
    assert np.asarray(valid).mean() < 0.05, np.asarray(valid).mean()


def test_halo_contention_picks_best_fit_source():
    """Two perpendicular walls meet near a corner; the unmapped voxel
    adjacent to both must inherit the plane that best explains its own
    center — deterministically, not by duplicate-scatter lottery."""
    rng = np.random.default_rng(3)
    # wall A: z = 0 plane, wall B: x = 2.0 plane; halo voxels near the
    # crease are face neighbors of voxels from both walls
    xy = rng.uniform(0, 1.9, (3000, 2)).astype(np.float32)
    wall_a = np.stack(
        [xy[:, 0], xy[:, 1],
         rng.normal(0, 0.005, 3000).astype(np.float32)], -1)
    yz = rng.uniform(0.1, 2.0, (3000, 2)).astype(np.float32)
    wall_b = np.stack(
        [2.0 + rng.normal(0, 0.005, 3000).astype(np.float32),
         yz[:, 0], yz[:, 1]], -1)
    pts = np.concatenate([wall_a, wall_b]).astype(np.float32)
    m = surfel_map.empty(res=0.4, table_size=1 << 13)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool),
                          thickness=jnp.float32(0.1))
    # halo voxels exist one voxel outside each wall; query points hovering
    # above wall A (inside its halo layer) must see wall A's plane.
    # Points near the crease are excluded: there the halo voxel genuinely
    # borders both walls and wall B's plane can be the better fit.
    far_from_b = wall_a[wall_a[:, 0] < 1.2][:300]
    hover = far_from_b + np.array([0, 0, 0.5], np.float32)  # next voxel up
    assert len(hover) == 300
    n, resid, valid = surfel_map.query_planes(
        m, jnp.asarray(hover), jnp.ones(300, bool), window=1)
    v = np.asarray(valid)
    assert v.mean() > 0.5, v.mean()
    nz = np.abs(np.asarray(n)[v][:, 2])
    # every valid halo plane near wall A must be wall-A-like (normal ~ z)
    assert (nz > 0.9).mean() > 0.95, (nz > 0.9).mean()
    # and its residual ~ the hover height, not wall B's offset
    assert np.abs(np.abs(np.asarray(resid)[v]) - 0.5).max() < 0.1


def test_insert_deterministic_same_backend():
    """Repeated identical inserts produce bit-identical plane caches (the
    contended-write paths must have no run-to-run lottery)."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(-5, 5, (4000, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) * 0.01  # squash to a rough surface
    maps = []
    for _ in range(2):
        m = surfel_map.empty(res=0.4, table_size=1 << 12)
        m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(4000, bool),
                              jnp.float32(0.1), hood_cap=1024)
        maps.append(m)
    np.testing.assert_array_equal(np.asarray(maps[0].plane_n),
                                  np.asarray(maps[1].plane_n))
    np.testing.assert_array_equal(np.asarray(maps[0].plane_d),
                                  np.asarray(maps[1].plane_d))
    np.testing.assert_array_equal(np.asarray(maps[0].plane_valid),
                                  np.asarray(maps[1].plane_valid))
