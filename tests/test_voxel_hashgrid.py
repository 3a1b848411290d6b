import jax
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import hashgrid, knn, voxel


def _np_voxel_downsample(pts, res):
    """Reference numpy implementation of centroid-per-voxel."""
    coords = np.floor(pts / res).astype(np.int64)
    out = {}
    for p, c in zip(pts, coords):
        out.setdefault(tuple(c), []).append(p)
    return np.array(sorted(np.mean(v, axis=0).tolist() for v in out.values()))


def _cloud(key, n=500, scale=5.0):
    return jax.random.uniform(jax.random.PRNGKey(key), (n, 3), minval=-scale,
                              maxval=scale)


def test_voxel_downsample_matches_numpy():
    pts = _cloud(0, 400)
    mask = jnp.ones(400, bool)
    out, om = voxel.voxel_downsample(pts, mask, res=1.0)
    got = np.asarray(out)[np.asarray(om)]
    want = _np_voxel_downsample(np.asarray(pts), 1.0)
    got = np.array(sorted(got.tolist()))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_downsample_respects_mask():
    pts = jnp.concatenate([_cloud(1, 100), jnp.full((50, 3), 1e6)], axis=0)
    mask = jnp.concatenate([jnp.ones(100, bool), jnp.zeros(50, bool)])
    out, om = voxel.voxel_downsample(pts, mask, res=1.0)
    got = np.asarray(out)[np.asarray(om)]
    assert np.all(np.abs(got) < 100.0)
    want = _np_voxel_downsample(np.asarray(pts[:100]), 1.0)
    assert len(got) == len(want)


def test_voxel_downsample_out_cap():
    pts = _cloud(2, 300)
    mask = jnp.ones(300, bool)
    out, om = voxel.voxel_downsample(pts, mask, res=0.5, out_cap=16)
    assert out.shape == (16, 3)
    assert int(om.sum()) == 16  # plenty of voxels, cap saturates


def test_voxel_downsample_single_voxel():
    pts = jnp.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.3, 0.3]])
    mask = jnp.ones(3, bool)
    out, om = voxel.voxel_downsample(pts, mask, res=1.0)
    assert int(om.sum()) == 1
    np.testing.assert_allclose(np.asarray(out[0]), [0.2, 0.2, 0.2], atol=1e-6)


def test_hashgrid_build_and_nn():
    pts = _cloud(3, 256, scale=4.0)
    mask = jnp.ones(256, bool)
    grid = hashgrid.build(pts, mask, res=0.5, table_size=2048)
    # query at exact point locations: NN should be the point itself
    q = pts[:50]
    nn_pts, d2, src, found = hashgrid.query_nn(grid, q, jnp.ones(50, bool))
    assert np.asarray(found).all()
    # the found point is within the same voxel (could be a same-voxel winner)
    assert np.all(np.asarray(d2) <= 3 * 0.5**2 + 1e-6)


def test_hashgrid_nn_matches_brute_on_sparse():
    # sparse cloud: voxel occupancy 1 per voxel -> grid NN == exact NN
    pts = (
        jnp.array(
            np.stack(
                np.meshgrid(np.arange(8), np.arange(8), np.arange(4)), -1
            ).reshape(-1, 3)
        ).astype(jnp.float32)
        * 1.0
    )
    n = pts.shape[0]
    mask = jnp.ones(n, bool)
    grid = hashgrid.build(pts, mask, res=1.0, table_size=1024)
    q = pts[:64] + 0.3
    qm = jnp.ones(64, bool)
    nn_pts, d2, src, found = hashgrid.query_nn(grid, q, qm, window=3)
    bd2, bidx, bv = knn.brute_nn(q, qm, pts, mask)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-5)


def test_hashgrid_knn_recall_vs_brute():
    pts = _cloud(5, 2048, scale=6.0)
    mask = jnp.ones(2048, bool)
    # voxelize first like the loop-closure path does (0.3 res)
    vp, vm = voxel.voxel_downsample(pts, mask, res=0.3)
    grid = hashgrid.build(vp, vm, res=0.3, table_size=8192)
    q = vp[:256]
    qm = vm[:256]
    k = 10
    gp, gd2, gv = hashgrid.query_knn(grid, q, qm, k=k, window=5)
    bd2, bidx, bv = knn.brute_knn(q, qm, vp, vm, k=k)
    # contract: within the guaranteed window reach (2*res for window=5, since
    # a point within 2*res differs by <=2 voxel coords) grid kNN == brute kNN
    gd = np.sqrt(np.asarray(gd2))
    bd = np.sqrt(np.asarray(bd2))
    both = np.asarray(gv) & np.asarray(bv)
    in_reach = both & (bd <= 2 * 0.3 - 1e-4)
    agree = np.isclose(gd[in_reach], bd[in_reach], atol=1e-4)
    # tiny tolerance for hash-table drop losses (<0.5%)
    assert agree.mean() > 0.995, f"in-window recall too low: {agree.mean()}"
    assert in_reach.sum() > 100  # the comparison actually covered something


def test_hashgrid_insert_keeps_existing():
    pts1 = jnp.array([[0.25, 0.25, 0.25]])
    pts2 = jnp.array([[0.4, 0.4, 0.4], [5.0, 5.0, 5.0]])
    grid = hashgrid.build(pts1, jnp.ones(1, bool), res=1.0, table_size=64)
    grid = hashgrid.insert(grid, pts2, jnp.ones(2, bool))
    # voxel (0,0,0) keeps its first point; (5,5,5) added
    q = jnp.array([[0.4, 0.4, 0.4], [5.1, 5.1, 5.1]])
    nn_pts, d2, src, found = hashgrid.query_nn(grid, q, jnp.ones(2, bool))
    np.testing.assert_allclose(np.asarray(nn_pts[0]), [0.25, 0.25, 0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nn_pts[1]), [5.0, 5.0, 5.0], atol=1e-6)
    assert np.asarray(found).all()


def test_brute_knn_masks():
    db = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [9e5, 0, 0]])
    dbm = jnp.array([True, True, True, False])
    q = jnp.array([[0.9, 0, 0], [100.0, 0, 0]])
    qm = jnp.array([True, False])
    d2, idx, valid = knn.brute_knn(q, qm, db, dbm, k=2)
    assert idx[0, 0] == 1 and idx[0, 1] == 0
    assert not np.asarray(valid[1]).any()


def test_empty_grid_query():
    grid = hashgrid.empty(res=0.5, table_size=64)
    q = jnp.zeros((4, 3))
    nn_pts, d2, src, found = hashgrid.query_nn(grid, q, jnp.ones(4, bool))
    assert not np.asarray(found).any()
