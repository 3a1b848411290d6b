"""Per-stage profiler for the KITTI-scale surfel-map insert path.

Measures the device cost of each sub-stage of `surfel_map.insert` (and the
surrounding `_process_scan` stages) at production scale: 32k-point scans,
2^19-slot table, realistic occupancy.  Each stage is timed as the median
single-dispatch latency (host read at the end, per CLAUDE.md) minus the
measured null-dispatch floor; successive calls carry a real data dep.

Usage:  python -m fast_lio_sam_qn_tpu.tools.profile_insert
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fast_lio_sam_qn_tpu.ops import surfel_map
from fast_lio_sam_qn_tpu.ops.hashgrid import _scatter_rounds, _INT_MAX
from fast_lio_sam_qn_tpu.ops.surfel_map import (
    _locate, _refit_planes, _vox_center)
from fast_lio_sam_qn_tpu.ops.voxel import voxel_coords

N = 32768
TABLE = 1 << 19
RES = 0.5
HOOD_CAP = 8192


_WORLD = None


def make_scan(seed, offset):
    """Realistic overlap: scans re-observe a fixed world surface (plus
    sensor noise), so successive inserts mostly touch EXISTING voxels —
    like a vehicle at ~2 m/scan — instead of all-fresh random voxels."""
    global _WORLD
    if _WORLD is None:
        rng = np.random.default_rng(0)
        w = rng.uniform([-60, -60, -2], [60, 60, 6],
                        size=(6 * N, 3)).astype(np.float32)
        _WORLD = w
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(_WORLD), size=N, replace=False)
    pts = _WORLD[sel] + rng.normal(0, 0.01, (N, 3)).astype(np.float32)
    return jnp.asarray(pts), jnp.ones(N, bool)


def _read(out):
    np.asarray(jax.tree.leaves(out)[-1]).sum()


def amortized_ms(fn, carry, r1=2, r2=12, pairs=3):
    """Dispatch-free steady-state: ONE jitted fori_loop with a TRACED trip
    count (single compile), timed at two run lengths and differenced —
    cancels the tunnel's fluctuating dispatch floor within each pair.
    fn(carry, i) -> carry, using i for a real data dep per iteration."""
    def loop(r, c):
        return jax.lax.fori_loop(
            0, r, lambda i, cc: fn(cc, i.astype(jnp.float32)), c)

    f = jax.jit(loop)
    out = f(jnp.int32(r1), carry)
    _read(out)
    est = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        _read(f(jnp.int32(r1), carry))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _read(f(jnp.int32(r2), carry))
        tb = time.perf_counter() - t0
        est.append((tb - ta) * 1e3 / (r2 - r1))
    return float(np.median(est))


def main():
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.setup()
    print("platform:", jax.devices()[0].platform, flush=True)

    # populate the map with 12 scans so occupancy is realistic
    m = surfel_map.empty(RES, TABLE)
    th = jnp.float32(0.1)
    for s in range(12):
        pts, mask = make_scan(s, [s * 2.0, 0, 0])
        m = surfel_map.insert(m, pts, mask, th, hood_cap=HOOD_CAP)
    occ = int(jnp.sum(m.occupied))
    print(f"occupied voxels: {occ} / {TABLE} ({100*occ/TABLE:.1f}%)")

    pts, mask = make_scan(99, [6.0, 1.0, 0.0])

    # --- full insert (production knobs: dirty-bit halo capped at 4096) ---
    def full(c, i):
        mm, p, acc = c
        mm = surfel_map.insert(mm, p + 1e-6 * i, mask, th, hood_cap=HOOD_CAP,
                               halo_cap=4096)
        return (mm, p, acc + mm.psum[0, 0] * 1e-12)
    print(f"full insert:        "
          f"{amortized_ms(full, (m, pts, jnp.float32(0))):8.2f} ms", flush=True)

    def full_hood7(c, i):
        mm, p, acc = c
        mm = surfel_map.insert(mm, p + 1e-6 * i, mask, th, hood_cap=HOOD_CAP,
                               halo_cap=4096, hood_window=7)
        return (mm, p, acc + mm.psum[0, 0] * 1e-12)
    print(f"full insert hood7:  "
          f"{amortized_ms(full_hood7, (m, pts, jnp.float32(0))):8.2f} ms",
          flush=True)

    def no_halo(c, i):
        mm, p, acc = c
        mm = surfel_map.insert(mm, p + 1e-6 * i, mask, th, hood_cap=HOOD_CAP,
                               halo=False)
        return (mm, p, acc + mm.psum[0, 0] * 1e-12)
    print(f"insert w/o halo:    "
          f"{amortized_ms(no_halo, (m, pts, jnp.float32(0))):8.2f} ms",
          flush=True)

    # --- stage: locate (x1) ---
    def loc(c, i):
        p, acc = c
        coords = voxel_coords(p + 1e-6 * i, RES)
        slot, found = _locate(m, coords)
        return (p, acc + jnp.sum(slot) * 1e-9)
    print(f"locate 32k:         "
          f"{amortized_ms(loc, (pts, jnp.float32(0))):8.2f} ms", flush=True)

    # --- stage: claim rounds ---
    def claim(c, i):
        p, acc = c
        coords = voxel_coords(p + 1e-6 * i, RES)
        slot, found = _locate(m, coords)
        occ2, w0 = m.occupied, jnp.full((TABLE + 1,), _INT_MAX, jnp.int32)
        occ2, winner, _ = _scatter_rounds(occ2, w0, coords, mask, TABLE,
                                          already_present=found)
        return (p, acc + jnp.sum(winner[:8]) * 1e-9)
    print(f"claim rounds:       "
          f"{amortized_ms(claim, (pts, jnp.float32(0))):8.2f} ms", flush=True)

    # --- stage: packed moment scatter-add (one (n, 10) scatter) ---
    from fast_lio_sam_qn_tpu.ops.surfel_map import _outer_sym

    def moments(c, i):
        p, acc = c
        coords = voxel_coords(p + 1e-6 * i, RES)
        slot, found = _locate(m, coords)
        use = mask & found
        sidx = jnp.where(use, slot, TABLE)
        w = use.astype(jnp.float32)
        rel = p - _vox_center(coords, RES)
        upd = jnp.concatenate(
            [w[:, None], rel * w[:, None], _outer_sym(rel) * w[:, None]],
            axis=-1)
        added = jnp.zeros((TABLE + 1, 10), jnp.float32).at[sidx].add(
            upd)[:TABLE]
        tot = (m.mom + added)[0, 0]
        return (p, acc + tot * 1e-9)
    print(f"moment scatter:     "
          f"{amortized_ms(moments, (pts, jnp.float32(0))):8.2f} ms", flush=True)

    # --- stage: refit (own + hood) ---
    coords0 = voxel_coords(pts, RES)
    slot0, found0 = _locate(m, coords0)
    use0 = mask & found0

    def refit(c, i):
        mm, acc = c
        mm2, _, _, _ = _refit_planes(
            mm, jnp.clip(slot0, 0, TABLE - 1), use0,
            th + acc * 1e-12, hood_cap=HOOD_CAP)
        return (mm2, acc + mm2.plane_d[0] * 1e-12 + 1e-12)
    print(f"refit planes:       "
          f"{amortized_ms(refit, (m, jnp.float32(0))):8.2f} ms", flush=True)

    def refit_own_only(c, i):
        mm, acc = c
        mm2, _, _, _ = _refit_planes(
            mm, jnp.clip(slot0, 0, TABLE - 1), use0,
            th + acc * 1e-12, hood_cap=1)
        return (mm2, acc + mm2.plane_d[0] * 1e-12 + 1e-12)
    print(f"refit own-only:     "
          f"{amortized_ms(refit_own_only, (m, jnp.float32(0))):8.2f} ms", flush=True)

    # --- stage: evict ---
    def ev(c, i):
        mm, acc = c
        mm2 = surfel_map.evict_beyond(mm, jnp.zeros(3) + acc * 1e-12,
                                      jnp.float32(90.0))
        return (mm2, acc + mm2.count[0] * 1e-12 + 1e-12)
    print(f"evict_beyond:       "
          f"{amortized_ms(ev, (m, jnp.float32(0))):8.2f} ms", flush=True)

    # --- stage: query_planes (the update path's association) ---
    def qp(c, i):
        p, acc = c
        n, resid, valid = surfel_map.query_planes(m, p + 1e-6 * i, mask,
                                                  window=1)
        return (p, acc + jnp.sum(resid) * 1e-9)
    print(f"query_planes w=1:   "
          f"{amortized_ms(qp, (pts, jnp.float32(0))):8.2f} ms", flush=True)

    # --- realistic PLANAR scene: surfaces converge, so the steady-state
    # lax.cond fast paths (skip claim/hood/halo when nothing changed)
    # engage — the random-volume scene above is the worst case where they
    # never do ---
    from fast_lio_sam_qn_tpu.utils import sim as _sim

    world = _sim.World.room(size=120.0, height=8.0, n_boxes=24, seed=7)
    mp = surfel_map.empty(RES, TABLE)
    T = np.eye(4)
    for s in range(12):
        T2 = T.copy()
        T2[:3, 3] = [2.0 * s, 0.0, 1.5]
        sp, _ = _sim.simulate_scan(world, T2, n_points=N, noise=0.01,
                                   seed=300 + s)
        spw = sp @ T2[:3, :3].T + T2[:3, 3]
        mp = surfel_map.insert(mp, jnp.asarray(spw), jnp.ones(N, bool), th,
                               hood_cap=HOOD_CAP, halo_cap=4096,
                               hood_window=7)
    occ2 = int(jnp.sum(mp.occupied))
    print(f"planar scene occupancy: {occ2}", flush=True)
    sp, _ = _sim.simulate_scan(world, T2, n_points=N, noise=0.01, seed=999)
    spw = jnp.asarray(sp @ T2[:3, :3].T + T2[:3, 3])

    def planar(c, i):
        mm, p, acc = c
        mm = surfel_map.insert(mm, p + 1e-6 * i, jnp.ones(N, bool), th,
                               hood_cap=HOOD_CAP, halo_cap=4096,
                               hood_window=7)
        return (mm, p, acc + mm.psum[0, 0] * 1e-12)
    print(f"planar steady-state insert (hood7): "
          f"{amortized_ms(planar, (mp, spw, jnp.float32(0))):8.2f} ms",
          flush=True)

    # --- FULL per-scan LIO step at production scale (the VERDICT item-3
    # acceptance number: 32k-pt scan, 2^19 slots, kitti preset) ---
    from fast_lio_sam_qn_tpu.models.lio import LIO, _process_scan
    from fast_lio_sam_qn_tpu.utils.config import LioConfig

    cfg = LioConfig()  # kitti-scale defaults: 32768 cap, 1<<19 slots
    lio = LIO(cfg)
    state = lio.init_state()
    traj = _sim.Trajectory.straight(speed=2.0)
    # warm the map with 10 sequential scans (carried state)
    for s in range(10):
        t0, t1 = s * 0.1, (s + 1) * 0.1
        rp, rt = _sim.simulate_scan_swept(world, traj, t0, n_points=N,
                                          noise=0.01, seed=400 + s)
        cl, mk = _sim.pad_cloud(rp, N)
        ts, gy, ac = _sim.simulate_imu(traj, t0, t1, rate=200.0)
        it = np.zeros(64, np.float32)
        ig = np.zeros((64, 3), np.float32)
        ia = np.zeros((64, 3), np.float32)
        im = np.zeros(64, bool)
        kk = min(len(ts), 64)
        it[:kk], ig[:kk], ia[:kk], im[:kk] = ts[:kk], gy[:kk], ac[:kk], True
        state, _ = lio.process_scan(
            state, jnp.asarray(cl), jnp.asarray(rt), jnp.asarray(mk),
            jnp.asarray(it), jnp.asarray(ig), jnp.asarray(ia),
            jnp.asarray(im), t0, t1)

    def step(c, i):
        st, acc = c
        st2, res = _process_scan(
            st, jnp.asarray(cl) + 1e-6 * i, jnp.asarray(rt),
            jnp.asarray(mk), jnp.asarray(it), jnp.asarray(ig),
            jnp.asarray(ia), jnp.asarray(im),
            st.t, st.t + jnp.float32(0.1), lio._noise,
            blind=cfg.blind, filter_num=cfg.point_filter_num,
            surf_res=cfg.filter_size_surf, out_cap=cfg.max_points_per_scan,
            max_iter=cfg.max_iteration, plane_k=cfg.plane_k,
            plane_threshold=cfg.plane_threshold, det_range=cfg.det_range,
            map_backend="surfel", surfel_window=cfg.surfel_query_window,
            surfel_hood_cap=cfg.surfel_hood_cap,
            surfel_hood_window=cfg.surfel_hood_window,
            surfel_halo_cap=cfg.surfel_halo_cap)
        return (st2, acc + res.pose[0, 3] * 1e-9)
    print(f"FULL per-scan LIO step (kitti preset, device): "
          f"{amortized_ms(step, (state, jnp.float32(0))):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
