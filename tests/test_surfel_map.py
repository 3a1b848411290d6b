import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import surfel_map
from fast_lio_sam_qn_tpu.utils import sim


def test_plane_recovery_on_wall():
    """Points on z=0 get a cached plane with normal +-z and tiny residuals."""
    rng = np.random.default_rng(0)
    xy = rng.uniform(-3, 3, (2000, 2)).astype(np.float32)
    pts = np.concatenate(
        [xy, rng.normal(0, 0.01, (2000, 1)).astype(np.float32)], -1)
    m = surfel_map.empty(res=0.5, table_size=1 << 12)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(2000, bool),
                          thickness=jnp.float32(0.1))
    q = jnp.asarray(pts[:200])
    n, resid, valid = surfel_map.query_planes(m, q, jnp.ones(200, bool))
    v = np.asarray(valid)
    assert v.mean() > 0.9, v.mean()
    nz = np.abs(np.asarray(n)[v][:, 2])
    assert (nz > 0.99).all()
    assert np.abs(np.asarray(resid)[v]).max() < 0.05


def test_thickness_gate_rejects_volumes():
    """A 3D blob (not a surface) must not produce valid planes."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    m = surfel_map.empty(res=0.5, table_size=1 << 12)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(3000, bool),
                          thickness=jnp.float32(0.1))
    n, resid, valid = surfel_map.query_planes(
        m, jnp.asarray(pts[:200]), jnp.ones(200, bool))
    assert np.asarray(valid).mean() < 0.1


def test_moments_accumulate_across_inserts():
    """Two half-clouds inserted separately == one insert (same moments)."""
    rng = np.random.default_rng(2)
    xy = rng.uniform(-1, 1, (800, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((800, 1), np.float32)], -1)
    thick = jnp.float32(0.1)
    m1 = surfel_map.empty(res=0.5, table_size=1 << 10)
    m1 = surfel_map.insert(m1, jnp.asarray(pts), jnp.ones(800, bool), thick)
    m2 = surfel_map.empty(res=0.5, table_size=1 << 10)
    m2 = surfel_map.insert(m2, jnp.asarray(pts[:400]), jnp.ones(400, bool),
                           thick)
    m2 = surfel_map.insert(m2, jnp.asarray(pts[400:]), jnp.ones(400, bool),
                           thick)
    assert abs(float(m1.count.sum()) - float(m2.count.sum())) < 1e-3
    np.testing.assert_allclose(
        float(m1.psum.sum()), float(m2.psum.sum()), rtol=1e-5)


def test_evict_beyond():
    pts = np.array([[0.1, 0.1, 0.0], [50.0, 0.0, 0.0]], np.float32)
    m = surfel_map.empty(res=0.5, table_size=1 << 8)
    m = surfel_map.insert(m, jnp.asarray(pts), jnp.ones(2, bool),
                          jnp.float32(0.1))
    assert int(m.occupied.sum()) == 2
    m = surfel_map.evict_beyond(m, jnp.zeros(3), jnp.float32(10.0))
    assert int(m.occupied.sum()) == 1


def test_nbr_hint_invariant():
    """The face-neighbor hint table must agree with a full probe locate for
    EVERY occupied voxel after inserts (all claim tiers), halo claims, and
    eviction + slot-reuse churn — the hood refit and halo fan's
    bit-exactness rests on this invariant (_nbr_lookup docstring)."""
    rng = np.random.default_rng(7)
    m = surfel_map.empty(res=0.5, table_size=1 << 13)
    th = jnp.float32(0.12)
    for step in range(6):
        pts = rng.uniform(-10 - step, 10, (3000, 3)).astype(np.float32)
        pts[:, 2] = 0.1 * np.sin(pts[:, 0]) + 0.01 * pts[:, 2]
        mask = rng.uniform(size=3000) > 0.05
        m = surfel_map.insert(m, jnp.asarray(pts), jnp.asarray(mask), th,
                              hood_cap=512, halo=True, halo_cap=1024,
                              hood_window=7)
        if step == 3:  # evict, then keep inserting so slots are reused
            m = surfel_map.evict_beyond(
                m, jnp.asarray([3.0, 3.0, 0.0]), jnp.float32(8.0))
    occ = np.asarray(m.occupied)
    slots = jnp.asarray(np.nonzero(occ)[0], jnp.int32)
    coords = m.coords[slots]
    ns, ok = surfel_map._nbr_lookup(m, slots, coords)
    ref_slot, ref_found = surfel_map._locate(
        m, coords[:, None, :] + surfel_map._FACE[None])
    assert np.array_equal(np.asarray(ok), np.asarray(ref_found))
    assert np.array_equal(np.asarray(ns)[np.asarray(ok)],
                          np.asarray(ref_slot)[np.asarray(ref_found)])


def test_lio_surfel_backend_low_drift():
    """Full LIO with the surfel map on the simulated loop (the quality bar
    set by the point-grid backend: <0.15 m final drift)."""
    from fast_lio_sam_qn_tpu.models.lio import LIO
    from fast_lio_sam_qn_tpu.ops import ieskf, se3
    from fast_lio_sam_qn_tpu.utils.config import LioConfig

    world = sim.World.room(size=24.0, height=5.0, n_boxes=8, seed=3)
    traj = sim.Trajectory.loop(radius=7.0, period=40.0)
    period = 0.1
    cfg = LioConfig(
        blind=0.5, point_filter_num=1, filter_size_surf=0.3,
        filter_size_map=0.3, max_points_per_scan=4096,
        map_table_size=1 << 17, det_range=60.0, max_iteration=3,
        map_backend="surfel")
    lio = LIO(cfg)
    T0 = traj.pose(0.0)
    v0, _, _ = traj.derivatives(0.0)
    state = lio.init_state()
    state = state._replace(nav=state.nav._replace(
        v=jnp.asarray(T0[:3, :3].T @ v0, jnp.float32)))
    errs = []
    for i in range(60):
        t0, t1 = i * period, (i + 1) * period
        pts, rel_t = sim.simulate_scan_swept(
            world, traj, t0, n_points=4096, noise=0.01, seed=10 + i,
            scan_period=period)
        ts, gyro, acc = sim.simulate_imu(
            traj, t0, t1, rate=200.0, gyro_noise=0.002, acc_noise=0.02,
            seed=20 + i)
        pj, mask = sim.pad_cloud(pts, 4096)
        it = np.zeros(32, np.float32)
        ig = np.zeros((32, 3), np.float32)
        ia = np.zeros((32, 3), np.float32)
        im = np.zeros(32, bool)
        k = len(ts)
        it[:k], ig[:k], ia[:k], im[:k] = ts, gyro, acc, True
        state, res = lio.process_scan(
            state, jnp.asarray(pj), jnp.asarray(rel_t), jnp.asarray(mask),
            jnp.asarray(it), jnp.asarray(ig), jnp.asarray(ia),
            jnp.asarray(im), t0, t1)
        T_gt = np.linalg.inv(T0) @ traj.pose(t1)
        errs.append(np.linalg.norm(np.asarray(res.pose)[:3, 3] - T_gt[:3, 3]))
    errs = np.array(errs)
    assert errs[-1] < 0.15, errs[-5:]
    assert errs.max() < 0.3, errs.max()


def test_compact_rank_equals_stable_argsort():
    """_compact_idx's counting-rank formulation must be BIT-EQUAL to
    stable argsort for every key family the insert uses (bool wanted
    masks; the halo's 3-class priority), including the tail filler rows —
    the halo dedup's rank tie-break depends on compacted row order."""
    import jax.numpy as jnp
    import numpy as np

    from fast_lio_sam_qn_tpu.ops import surfel_map as sm

    rng = np.random.default_rng(7)
    n = 4096
    for cap in (64, 1024, n):
        for num_classes, key in (
                (2, rng.random(n) > 0.9),          # sparse wanted
                (2, rng.random(n) > 0.1),          # dense wanted
                (2, np.zeros(n, bool)),            # none wanted
                (3, rng.integers(0, 3, n))):       # halo priority
            k = jnp.asarray(np.asarray(key, np.int32))
            ref = jnp.argsort(k, stable=True)[:cap]
            got = sm._compact_idx(k, cap, num_classes=num_classes)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_locate_flat_bitexact_vs_locate():
    """_locate_flat (probe-0 fast path + compacted remainder) must be
    BIT-EQUAL to _locate on maps with probe collisions AND eviction-
    hollowed probe chains (a voxel sitting at probe p>0 whose probe-0
    slot was evicted must still be found), across cap regimes including
    the cond fallback (misses > cap)."""
    import jax
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import surfel_map as sm

    rng = np.random.default_rng(11)
    # tiny table -> heavy probe collisions
    m = sm.empty(res=0.5, table_size=1 << 8)
    pts = rng.uniform(-6, 6, (2000, 3)).astype(np.float32)
    m = sm.insert(m, jnp.asarray(pts), jnp.ones(2000, bool),
                  thickness=jnp.float32(0.1))
    # evict a shell: hollows out probe-0 slots of surviving far voxels
    m = sm.evict_beyond(m, jnp.zeros(3, jnp.float32), jnp.float32(4.0))
    # queries: mix of present, evicted, and never-present voxels
    q = np.concatenate([pts[:800],
                        rng.uniform(-8, 8, (800, 3)).astype(np.float32)])
    coords = jnp.asarray(np.floor(q / 0.5).astype(np.int32))
    ref_slot, ref_found = jax.jit(sm._locate)(m, coords)
    for cap in (64, 400, 1600):
        slot, found = jax.jit(
            lambda mm, cc: sm._locate_flat(mm, cc, cap=cap))(m, coords)
        np.testing.assert_array_equal(np.asarray(found),
                                      np.asarray(ref_found))
        np.testing.assert_array_equal(np.asarray(slot), np.asarray(ref_slot))


def test_refit_after_rows_reconstruction_bitexact():
    """_refit_planes' per-row post-refit reconstruction must equal a table
    gather whenever it reports recon_exact — across own-fit, hood-fit
    (capped and uncapped), duplicate-slot, and masked rows — and must
    report recon_exact=False when the hood batch overflows."""
    import jax

    from fast_lio_sam_qn_tpu.ops import surfel_map as sm
    from fast_lio_sam_qn_tpu.ops.voxel import voxel_coords

    rng = np.random.default_rng(7)
    # mix of surfaces (own-fit candidates) and sparse scatter (hood rows)
    xy = rng.uniform(-4, 4, (1500, 2)).astype(np.float32)
    wall = np.concatenate(
        [xy, rng.normal(0, 0.01, (1500, 1)).astype(np.float32)], -1)
    blob = rng.uniform(-4, 4, (500, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([wall, blob]))
    n = pts.shape[0]
    th = jnp.float32(0.1)
    m = sm.empty(res=0.5, table_size=1 << 12)
    m = sm.insert(m, pts, jnp.ones(n, bool), th)
    # duplicate-heavy slot list with some masked rows
    mask = jnp.asarray(rng.random(n) > 0.2)
    coords = voxel_coords(pts, m.res)
    slot, found = sm._locate(m, coords)
    use = mask & found
    t = m.table_size
    slots = jnp.clip(jnp.where(use, slot, t), 0, t - 1)

    for hood_cap, hood_window in [(None, 27), (4096, 27), (4096, 7)]:
        m2, _, after_est, exact = sm._refit_planes(
            m, slots, use, th, hood_cap=hood_cap, hood_window=hood_window)
        assert bool(exact), (hood_cap, hood_window)
        got = np.asarray(after_est)[np.asarray(use)]
        want = np.asarray(m2.plane[slots])[np.asarray(use)]
        np.testing.assert_array_equal(got, want)

    # overflow: cap smaller than the hood-row count -> exact must be False
    m3, _, _, exact3 = sm._refit_planes(m, slots, use, th, hood_cap=8)
    assert not bool(exact3)

    # full-insert equivalence: recon path (ample cap) vs gather fallback
    # (tiny cap forces recon_exact False -> the lax.cond takes the table
    # gather). Different caps change WHICH hood slots refit, so compare the
    # recon path against itself re-run — the real guarantee is the direct
    # row comparison above plus the insert-level invariant that a second
    # identical insert is deterministic.
    more = jnp.asarray(
        rng.uniform(-4, 4, (256, 3)).astype(np.float32))
    a = sm.insert(m, more, jnp.ones(256, bool), th, hood_cap=4096)
    b = sm.insert(m, more, jnp.ones(256, bool), th, hood_cap=4096)
    for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
