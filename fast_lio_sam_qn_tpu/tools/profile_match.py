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


if __name__ == "__main__":
    main()
