"""On-chip proof that the SMEM-operand Pallas kernels batch correctly.

The batched (vmapped) loop-closure paths currently avoid the bbox-pruned
banded kNN and the streaming-FPFH TPU kernels because their SMEM operands
(the per-block keep bitmap, the tile bboxes) are interpret-tested under
vmap but not chip-proven in a vmapped Mosaic lowering (see
models/loop_closure.py VMAP_PRUNED_KERNELS_PROVEN and PARITY.md).

Run this ON THE REAL TPU. It vmaps both kernel families over a batch of
bench-sized cloud pairs and asserts exact (banded kNN) / close (FPFH,
default-precision descriptor mass) agreement with the per-item loop. If
every check prints OK, flip VMAP_PRUNED_KERNELS_PROVEN to True and rerun
bench.py + the loop-closure tests.

HISTORY:
- round 3, v5e, BEFORE the custom_vmap rules existed: FAIL on every
  check — Mosaic's own vmap batching of the SMEM-operand kernels gave
  every block a leading singleton axis, corrupting the banded kNN's
  d2/idx on all batch items and putting up to 4.0 absolute error on
  FPFH descriptors (interpret mode matched exactly).
- round 3 (late) + round 4, v5e, WITH the custom_vmap rules
  (ops/pallas_knn._banded_caller, ops/fpfh_stream._stream_caller
  dispatching to natively grid-batched lowerings): **ALL OK** —
  committed artifact `results/vmap_proof_r4.txt`;
  VMAP_PRUNED_KERNELS_PROVEN = True is proven at HEAD, and bench.py
  re-asserts a vmapped-vs-per-item parity check on every run so the
  guard cannot silently rot.

If a refactor removes the custom_vmap rules, rerun this proof before
trusting vmapped kernels on chip; on FAIL, flip the flag back to False.

Usage: python -u -m fast_lio_sam_qn_tpu.tools.prove_vmap_kernels
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from fast_lio_sam_qn_tpu.utils import jaxenv

    jaxenv.setup()
    sys.path.insert(0, ".")
    import bench
    from fast_lio_sam_qn_tpu.ops import fpfh_stream, pallas_knn

    plat = jax.devices()[0].platform
    print(f"platform: {plat}", flush=True)
    if plat not in ("tpu", "axon"):
        print("NOT ON TPU — this proof is only meaningful on the chip")
        return 1

    (va, vma, vp1), (vb, vmb, vp2), _ = bench.build_pair()
    B = 4
    rng = np.random.default_rng(0)
    # batch of distinct pairs: jitter + per-item point dropout so every
    # lane sees different masks/bboxes (the SMEM operands differ per lane)
    src_b = jnp.stack([va + rng.normal(0, 0.05, va.shape).astype(np.float32)
                       for _ in range(B)])
    dst_b = jnp.stack([vb + rng.normal(0, 0.05, vb.shape).astype(np.float32)
                       for _ in range(B)])
    sm_b = jnp.stack([vma & jnp.asarray(rng.random(va.shape[0]) > 0.1 * i)
                      for i in range(B)])
    dm_b = jnp.stack([vmb & jnp.asarray(rng.random(vb.shape[0]) > 0.1 * i)
                      for i in range(B)])

    ok = True

    # --- banded kNN (SMEM keep bitmap) under vmap, k=1 and k=15 ---
    for k in (1, 15):
        def banded(s, smk, d, dmk):
            so = pallas_knn.morton_order(s, smk)
            do = pallas_knn.morton_order(d, dmk)
            return pallas_knn._knn_banded_tpu(
                s[so], smk[so], d[do], dmk[do], k)

        got = jax.jit(jax.vmap(banded))(src_b, sm_b, dst_b, dm_b)
        want = [jax.jit(banded)(src_b[i], sm_b[i], dst_b[i], dm_b[i])
                for i in range(B)]
        for i in range(B):
            for g, w, name in zip((got[0][i], got[1][i], got[2][i]),
                                  want[i], ("d2", "idx", "valid")):
                same = bool(jnp.all(jnp.where(want[i][2], g == w, True))) \
                    if name != "valid" else bool(jnp.all(g == w))
                if not same:
                    print(f"FAIL banded k={k} item {i} field {name}")
                    ok = False
        print(f"banded kNN k={k} vmapped == per-item: "
              f"{'OK' if ok else 'FAIL'}", flush=True)

    # --- streaming FPFH (SMEM tile bboxes) under vmap ---
    def fpfh(s, smk, vp):
        d, f, (n, nv, cv) = fpfh_stream.fpfh_radius(
            s, smk, 0.9, 1.5, viewpoint=vp, cov_radius=0.6, use_tpu=True)
        return d, f, cv

    vps = jnp.stack([vp1 + i * 0.1 for i in range(B)])
    got = jax.jit(jax.vmap(fpfh))(src_b, sm_b, vps)
    for i in range(B):
        want = jax.jit(fpfh)(src_b[i], sm_b[i], vps[i])
        for g, w, name, tol in zip((got[0][i], got[1][i], got[2][i]), want,
                                   ("desc", "valid", "cov"),
                                   (5e-3, 0.0, 1e-5)):
            diff = float(jnp.max(jnp.abs(
                g.astype(jnp.float32) - w.astype(jnp.float32))))
            if diff > tol:
                print(f"FAIL fpfh item {i} field {name} maxdiff {diff}")
                ok = False
    print(f"streaming FPFH vmapped == per-item: "
          f"{'OK' if ok else 'FAIL'}", flush=True)

    if ok:
        print("ALL OK — safe to flip VMAP_PRUNED_KERNELS_PROVEN = True")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
