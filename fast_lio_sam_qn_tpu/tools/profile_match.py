"""Per-stage loop-match profiling on the benchmark clouds.

profile_insert.py's counterpart for the loop-closure path: amortized
steady-state device timings of each stage of the full coarse-to-fine match
(FPFH extraction, feature matching, clique + GNC rotation + translation
voting, GICP fine, fitness) against the FULL match end-to-end, so the
optimization loop knows where the remaining milliseconds live.

Mirrors the workload of the reference's loop match
(/root/reference/fast_lio_sam_qn/src/loop_closure.cpp:110-159) at bench.py's
cloud sizes. Uses the same traced-trip-count fori_loop differencing as
profile_insert (cancels the tunnel dispatch floor).

Usage: python -u -m fast_lio_sam_qn_tpu.tools.profile_match
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def main():
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.setup()
    sys.path.insert(0, ".")
    import bench
    from fast_lio_sam_qn_tpu.ops import fpfh_stream, gicp, quatro
    from fast_lio_sam_qn_tpu.tools.profile_insert import amortized_ms

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    (va, vma, vp1), (vb, vmb, vp2), _ = bench.build_pair()
    print(f"src {int(vma.sum())}/{va.shape[0]}  "
          f"dst {int(vmb.sum())}/{vb.shape[0]}", flush=True)

    qcfg = dict(noise_bound=jnp.float32(0.3), gnc_factor=jnp.float32(1.4),
                cost_diff_thr=jnp.float32(1e-4),
                distance_threshold=jnp.float32(35.0))

    # --- stage inputs (computed once, real values) ---
    ds, fs_, (ns, nvs, cs) = fpfh_stream.fpfh_radius(
        va, vma, 0.9, 1.5, viewpoint=vp1, cov_radius=0.6)
    dd, fd, (nd, nvd, cd) = fpfh_stream.fpfh_radius(
        vb, vmb, 0.9, 1.5, viewpoint=vp2, cov_radius=0.6)
    from fast_lio_sam_qn_tpu.ops import fpfh as fpfh_mod
    fs2 = fpfh_mod.distinctive(ds, fs_, jnp.float32(65.0))
    fd2 = fpfh_mod.distinctive(dd, fd, jnp.float32(65.0))

    def extract_src(c, i):
        d, f, (n, nv, cv) = fpfh_stream.fpfh_radius(
            va + c * 1e-9, vma, 0.9, 1.5, viewpoint=vp1, cov_radius=0.6)
        return jnp.sum(d) * 1e-12 + jnp.sum(cv) * 1e-12 + i * 0.0

    def extract_dst(c, i):
        d, f, (n, nv, cv) = fpfh_stream.fpfh_radius(
            vb + c * 1e-9, vmb, 0.9, 1.5, viewpoint=vp2, cov_radius=0.6)
        return jnp.sum(d) * 1e-12 + jnp.sum(cv) * 1e-12 + i * 0.0

    def matching(c, i):
        s, d, valid = quatro.match_features(
            va + c * 1e-9, ds, fs2, vb + c * 1e-9, dd, fd2,
            qcfg["distance_threshold"], max_corres=200)
        return jnp.sum(s) * 1e-12 + jnp.sum(valid) * 1e-12 + i * 0.0

    def quatro_full(c, i):
        q = quatro.align(va + c * 1e-9, ds, fs2, vb, dd, fd2,
                         max_corres=200, rot_max_iter=50, **qcfg)
        return jnp.sum(q.transform) * 1e-9 + i * 0.0

    def gicp_fine(c, i):
        res = gicp.align(va + c * 1e-9, vma, vb, vmb,
                         max_iter=32, max_corr_dist=52.5,
                         src_cov=(cs, nvs), dst_cov=(cd, nvd))
        return jnp.sum(res.transform) * 1e-9 + res.fitness * 1e-9 + i * 0.0

    def gicp_fine_unbanded(c, i):
        res = gicp.align(va + c * 1e-9, vma, vb, vmb,
                         max_iter=32, max_corr_dist=52.5,
                         src_cov=(cs, nvs), dst_cov=(cd, nvd), banded=False)
        return jnp.sum(res.transform) * 1e-9 + res.fitness * 1e-9 + i * 0.0

    def full(c, i):
        T, fit, conv = bench.full_match(
            (va + c * 1e-9, vma, vp1 + c * 1e-9),
            (vb + c * 1e-9, vmb, vp2 + c * 1e-9))
        return fit + jnp.sum(T) * 1e-9 + i * 0.0

    c0 = jnp.float32(0.0)
    for name, fn in [("extract src", extract_src),
                     ("extract dst", extract_dst),
                     ("feature matching", matching),
                     ("quatro coarse (all)", quatro_full),
                     ("gicp fine+fitness", gicp_fine),
                     ("gicp fine unbanded", gicp_fine_unbanded),
                     ("FULL match", full)]:
        print(f"{name:<22}{amortized_ms(fn, c0):8.2f} ms", flush=True)

    # ------------------------------------------------------------------
    # ADVANCED matching mode (use_optimized_matching=false, README.md:21):
    # all mutual matches ungated, ADV_CORRES=2048 static ceiling — the
    # reference's 140 ms row. Per-stage numbers so the 13 ms headline's
    # headroom is known (round-4 verdict item 5). The clique stage is
    # profiled in two parts: compat-matrix + replicator matvecs (parallel
    # work) vs the sequential greedy verification pass.
    # ------------------------------------------------------------------
    ADV = bench.ADV_CORRES
    nb = jnp.float32(0.3)

    def matching_adv(c, i):
        s, d, valid = quatro.match_features(
            va + c * 1e-9, ds, fs2, vb + c * 1e-9, dd, fd2,
            qcfg["distance_threshold"], max_corres=ADV,
            optimized_matching=False)
        return jnp.sum(s) * 1e-12 + jnp.sum(valid) * 1e-12 + i * 0.0

    s_adv, d_adv, v_adv = quatro.match_features(
        va, ds, fs2, vb, dd, fd2, qcfg["distance_threshold"],
        max_corres=ADV, optimized_matching=False)
    print(f"advanced mutual matches: {int(jnp.sum(v_adv))}/{ADV}",
          flush=True)

    def clique_adv(c, i):
        inl = quatro.max_clique_inliers(s_adv + c * 1e-9, d_adv, v_adv, nb)
        return jnp.sum(inl) * 1e-9 + i * 0.0

    def clique_no_greedy(c, i):
        # compat matrix + 64 replicator iterations only (the parallel
        # part of max_clique_inliers, duplicated here for isolation)
        sp = s_adv + c * 1e-9
        cc = sp.shape[0]
        dss = jnp.linalg.norm(sp[:, None, :] - sp[None, :, :], axis=-1)
        ddd = jnp.linalg.norm(d_adv[:, None, :] - d_adv[None, :, :],
                              axis=-1)
        A = ((jnp.abs(dss - ddd) <= 2.0 * nb) & v_adv[:, None]
             & v_adv[None, :] & ~jnp.eye(cc, dtype=bool)).astype(
            jnp.float32)
        x = v_adv.astype(jnp.float32)
        x = x / jnp.maximum(jnp.sum(x), 1.0)

        def rd(_, xx):
            num = xx * (A @ xx)
            return num / jnp.maximum(jnp.sum(num), 1e-12)

        x = jax.lax.fori_loop(0, 64, rd, x)
        return jnp.sum(x) * 1e-9 + i * 0.0

    inl_adv = quatro.max_clique_inliers(s_adv, d_adv, v_adv, nb)

    def gnc_adv(c, i):
        yaw, wt, ok = quatro.gnc_rotation_yaw(
            s_adv + c * 1e-9, d_adv, inl_adv, nb, jnp.float32(1.4),
            jnp.float32(1e-4), max_iter=50)
        return yaw * 1e-9 + jnp.sum(wt) * 1e-12 + i * 0.0

    def voting_adv(c, i):
        t, votes = quatro.translation_voting(
            s_adv + c * 1e-9, d_adv, inl_adv, jnp.float32(0.1), nb)
        return jnp.sum(t) * 1e-9 + i * 0.0

    def quatro_adv(c, i):
        q = quatro.align(va + c * 1e-9, ds, fs2, vb, dd, fd2,
                         max_corres=ADV, rot_max_iter=50,
                         optimized_matching=False, **qcfg)
        return jnp.sum(q.transform) * 1e-9 + i * 0.0

    def full_adv(c, i):
        T, fit, conv = bench.full_match(
            (va + c * 1e-9, vma, vp1 + c * 1e-9),
            (vb + c * 1e-9, vmb, vp2 + c * 1e-9), optimized=False)
        return fit + jnp.sum(T) * 1e-9 + i * 0.0

    for name, fn in [("adv matching", matching_adv),
                     ("adv clique (all)", clique_adv),
                     ("adv compat+replicator", clique_no_greedy),
                     ("adv gnc rotation", gnc_adv),
                     ("adv translation vote", voting_adv),
                     ("adv quatro (all)", quatro_adv),
                     ("FULL advanced match", full_adv)]:
        print(f"{name:<22}{amortized_ms(fn, c0):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
