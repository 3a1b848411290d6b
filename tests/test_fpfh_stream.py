"""ops/fpfh_stream.py — streaming radius-FPFH: kernel parity (interpret
mode), numpy ground truth for the moments, and semantic agreement with the
kNN formulation (ops/fpfh.py) where the k caps don't bind."""
import numpy as np
import jax.numpy as jnp
import pytest

from fast_lio_sam_qn_tpu.ops import fpfh, fpfh_stream as fs


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    # box-structured cloud: surfaces + corners, ~0.3 voxel spacing scale
    n = 700
    pts = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    pts[: n // 2, 2] = np.abs(pts[: n // 2, 2]) * 0.05  # half on a floor
    mask = np.ones(n, bool)
    mask[-10:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def test_moments_match_numpy(cloud):
    p, m = cloud
    mom = fs._moments_xla(p, m, 0.9)
    pts = np.asarray(p)
    msk = np.asarray(m)
    for i in (0, 13, 349):
        d2 = np.sum((pts - pts[i]) ** 2, axis=1)
        sel = msk & (d2 <= 0.9 * 0.9)
        np.testing.assert_allclose(mom[i, 0], sel.sum(), atol=1e-3)
        np.testing.assert_allclose(mom[i, 1:4], pts[sel].sum(0), rtol=1e-4,
                                   atol=1e-3)
        q = pts[sel]
        np.testing.assert_allclose(
            mom[i, 4], (q[:, 0] ** 2).sum(), rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("td", [128, 512])
def test_interpret_mode_kernel_parity(cloud, td):
    """Pallas kernels (interpret mode) vs the XLA fallback: identical
    masked reductions -> near-exact agreement, at every db tile width the
    td knob exposes."""
    p, m = cloud
    momT = fs._moments_tpu(p, m, 0.9, 0.6, interpret=True, td=td)
    momX = fs._moments_xla(p, m, 0.9, 0.6)
    np.testing.assert_allclose(momT, momX, atol=1e-3)
    n_, nv_, _, _ = fs.moments_to_normals_covs(momX, p, m, None)
    sT = fs._spfh_tpu(p, m, n_, nv_, 1.5, interpret=True, td=td)
    sX = fs._spfh_xla(p, m, n_, nv_, 1.5)
    np.testing.assert_allclose(sT, sX, atol=1e-3)
    spfh = sX[:, :33] / jnp.maximum(sX[:, 33:], 1.0)
    aT = fs._fpfh_agg_tpu(p, m, nv_, spfh, 1.5, interpret=True, td=td)
    aX = fs._fpfh_agg_xla(p, m, nv_, spfh, 1.5)
    np.testing.assert_allclose(aT, aX, rtol=1e-4, atol=1e-2)


def test_plane_covariance_geometry():
    """Points on a tilted plane: regularized covariance's small axis must
    be the plane normal, with Nano-GICP (eps, 1, 1) spectrum."""
    rng = np.random.default_rng(0)
    u = np.array([1.0, 0.0, 0.5]) / np.linalg.norm([1.0, 0.0, 0.5])
    v = np.array([0.0, 1.0, 0.0])
    nrm = np.cross(u, v)
    nrm /= np.linalg.norm(nrm)
    ab = rng.uniform(-1, 1, (256, 2)).astype(np.float32)
    pts = (ab[:, :1] * u + ab[:, 1:2] * v).astype(np.float32)
    p, m = jnp.asarray(pts), jnp.ones(256, bool)
    mom = fs._moments_xla(p, m, 0.9)
    normals, n_valid, cov_reg, _ = fs.moments_to_normals_covs(
        mom, p, m, jnp.asarray(10.0 * nrm, jnp.float32))
    assert bool(jnp.all(n_valid))
    dots = np.abs(np.asarray(normals) @ nrm)
    assert np.all(dots > 0.99), dots.min()
    # smallest eigendirection of cov_reg == normal; spectrum (eps, 1, 1)
    vals, vecs = np.linalg.eigh(np.asarray(cov_reg[0]))
    np.testing.assert_allclose(vals, [fs.PLANE_EPS, 1.0, 1.0], atol=1e-4)
    assert abs(vecs[:, 0] @ nrm) > 0.99


def test_semantic_agreement_with_knn_fpfh(cloud):
    """Where the kNN caps don't bind (sparse neighborhoods), the radius
    formulation agrees with ops/fpfh.py closely: same valid set, highly
    similar descriptors (bit-exactness is impossible — bin-edge rounding
    differs between the arctan2 and half-plane theta binnings)."""
    p, m = cloud
    desc_r, val_r, (nr, nvr, _) = fs.fpfh_radius(p, m, 0.9, 1.5)
    desc_k, val_k = fpfh.fpfh(p, m, jnp.float32(0.9), jnp.float32(1.5),
                              k_feat=64, k_normal=48)
    both = np.asarray(val_r & val_k)
    assert both.sum() > 200
    # neighbor caps of 64/48 exceed every in-radius count in this cloud
    mom = fs._moments_xla(p, m, 1.5)
    assert float(mom[:, 0].max()) < 64
    dr = np.asarray(desc_r)[both]
    dk = np.asarray(desc_k)[both]
    l1 = np.abs(dr - dk).sum(1) / 300.0   # descriptors sum to 300
    assert np.median(l1) < 0.02, np.median(l1)
    assert (l1 < 0.1).mean() > 0.95, (l1 < 0.1).mean()


def test_fpfh_radius_masks_invalid(cloud):
    p, m = cloud
    desc, valid, (normals, n_valid, cov) = fs.fpfh_radius(p, m, 0.9, 1.5)
    assert not bool(valid[-1])            # masked-out points stay invalid
    assert float(jnp.sum(jnp.abs(desc[~valid]))) == 0.0
    eye = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(cov)[~np.asarray(n_valid)],
                               np.broadcast_to(eye, (int((~n_valid).sum()), 3, 3)))


def test_eigh3_soa_matches_numpy():
    """linalg3.eigh3 (SoA Jacobi) vs np.linalg.eigh on random SPD-ish
    symmetric batches: eigenvalues ascending, eigenvectors up to sign."""
    from fast_lio_sam_qn_tpu.ops import linalg3

    rng = np.random.default_rng(7)
    B = rng.normal(0, 1, (257, 3, 3)).astype(np.float32)
    A = B @ np.swapaxes(B, -1, -2) + 0.01 * np.eye(3, dtype=np.float32)
    vals, vecs = linalg3.eigh3(jnp.asarray(A))
    ref_vals, ref_vecs = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=2e-4,
                               atol=2e-4)
    dots = np.abs(np.einsum("nij,nij->nj", np.asarray(vecs), ref_vecs))
    assert dots.min() > 0.999, dots.min()


def test_bbox_pruning_is_exact(cloud):
    """Morton-sorted inputs make the tile bbox prune fire; pruned tiles
    contribute exactly zero, so results must match the unpruned XLA
    fallback bit-for-bit (same summation order on identical tile sets)."""
    p, m = cloud
    order = fs._morton_order(p, m)
    ps, ms = p[order], m[order]
    momT = fs._moments_tpu(ps, ms, 0.9, 0.6, interpret=True)
    momX = fs._moments_xla(ps, ms, 0.9, 0.6)
    np.testing.assert_allclose(momT, momX, atol=1e-3)
    n_, nv_, _, _ = fs.moments_to_normals_covs(momX, ps, ms, None)
    sT = fs._spfh_tpu(ps, ms, n_, nv_, 1.5, interpret=True)
    sX = fs._spfh_xla(ps, ms, n_, nv_, 1.5)
    np.testing.assert_allclose(sT, sX, atol=1e-3)
    spfh = sX[:, :33] / jnp.maximum(sX[:, 33:], 1.0)
    aT = fs._fpfh_agg_tpu(ps, ms, nv_, spfh, 1.5, interpret=True)
    aX = fs._fpfh_agg_xla(ps, ms, nv_, spfh, 1.5)
    np.testing.assert_allclose(aT, aX, rtol=1e-4, atol=1e-2)
    # the sort must actually enable pruning: every valid point's morton
    # run is compact (sanity on the order itself)
    key_sorted = np.asarray(fs._morton_order(ps, ms))
    assert (np.diff(key_sorted) != 0).all()


def test_grid_batched_vmap_parity(cloud):
    """jax.vmap of the streaming drivers routes through custom_vmap to the
    natively GRID-BATCHED kernels (batch = leading grid dim; Mosaic's
    auto-batched SMEM-operand lowering is chip-disproven).  Each stage must
    match the per-item loop BIT-EXACTLY — identical kernel body, identical
    tile visit set per item."""
    import jax
    from fast_lio_sam_qn_tpu.ops.pallas_knn import morton_order

    p0, m0 = cloud
    rng = np.random.default_rng(11)
    B = 3
    pts = jnp.stack([p0 + rng.normal(0, 0.05, p0.shape).astype(np.float32)
                     for _ in range(B)])
    msk = jnp.stack([m0 & jnp.asarray(rng.random(p0.shape[0]) > 0.1 * i)
                     for i in range(B)])

    def one(p, m):
        o = morton_order(p, m)
        p, m = p[o], m[o]
        mom = fs._moments_tpu(p, m, 0.9, 0.6, interpret=True)
        n_, nv_, _, _ = fs.moments_to_normals_covs(mom, p, m, None)
        raw = fs._spfh_tpu(p, m, n_, nv_, 1.5, interpret=True)
        spfh = raw[:, :fs.FPFH_DIM] / jnp.maximum(
            raw[:, fs.FPFH_DIM], 1.0)[:, None]
        agg = fs._fpfh_agg_tpu(p, m, nv_, spfh, 1.5, interpret=True)
        return mom, raw, agg

    want = [one(pts[i], msk[i]) for i in range(B)]
    got = jax.vmap(one)(pts, msk)
    for i in range(B):
        for name, w, g in zip(("moments", "spfh", "agg"), want[i],
                              (got[0][i], got[1][i], got[2][i])):
            np.testing.assert_array_equal(
                np.asarray(w), np.asarray(g), err_msg=f"{name} item {i}")
