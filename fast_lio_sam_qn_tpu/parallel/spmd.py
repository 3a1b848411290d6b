"""SPMD kernels over a device mesh (shard_map + XLA collectives).

Three sharded surfaces (see parallel/mesh.py):

- ``sharded_gicp_align``: ONE registration with source points sharded
  across devices (sequence-parallel flavor). Each device owns a src shard
  (dst replicated), computes its local correspondences + covariance-
  weighted normal-equation blocks, and the 6x6 (H, b) are psum-reduced over
  ICI each Gauss-Newton iteration — the pose update happens replicated.
- ``batched_gicp_align``: B independent registrations data-parallel over
  the mesh (the multi-loop-candidate scenario; the reference can only ever
  process one candidate per timer tick — this removes that ceiling).
- ``pgo_hx_sharded``: pose-graph PCG with factors sharded; the matrix-free
  H@x scatter-adds locally, then psum-combines.

All functions also run unchanged on a 1-device mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import gicp, knn, linalg3, se3


# ---------------------------------------------------------------------------
# Point-sharded single registration
# ---------------------------------------------------------------------------

def sharded_gicp_align(
    mesh,
    src, src_mask, src_cov,
    dst, dst_mask, dst_cov,
    init_T,
    *,
    axis: str = "dp",
    max_iter: int = 32,
    max_corr_dist: float = 52.5,
    trans_eps: float = 0.01,
):
    """GICP Gauss-Newton with src points sharded over `axis`.

    src/src_mask/src_cov are sharded along their leading axis (must divide
    the mesh size); dst stays replicated. Returns (T, num_iters).
    """
    fn = _sharded_gicp_jit(mesh, axis, int(max_iter), float(max_corr_dist),
                           float(trans_eps))
    return fn(src, src_mask, src_cov, dst, dst_mask, dst_cov, init_T)


@functools.lru_cache(maxsize=None)
def _sharded_gicp_jit(mesh, axis, max_iter, max_corr_dist, trans_eps):
    """Jitted program built ONCE per (mesh, statics): wrapping jax.jit
    around a fresh closure per call would miss the trace cache and
    re-trace the whole GN loop every invocation (the pitfall
    LoopClosure._sharded_batch_cache documents)."""
    max_d2 = max_corr_dist * max_corr_dist

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
    )
    def run(src_l, smask_l, scov_l, dst_r, dmask_r, dcov_r, T0):
        def body(state):
            T, it, delta, done = state
            R = T[:3, :3]
            y = se3.transform_points(src_l, T)
            d2, idx, ok = knn.brute_nn(y, smask_l, dst_r, dmask_r)
            corr = ok & (d2 < max_d2)
            j = jnp.clip(idx, 0)
            RCsRt = jnp.einsum("ab,nbc,dc->nad", R, scov_l, R,
                               precision="highest")
            M = linalg3.inv3(dcov_r[j] + RCsRt)
            r = dst_r[j] - y
            Rtn_jw = se3.hat(y)
            w = corr.astype(src_l.dtype)
            MJw = jnp.einsum("nab,nbc->nac", M, Rtn_jw, precision="highest")
            Hww = jnp.einsum("nba,nbc,n->ac", Rtn_jw, MJw, w,
                             precision="highest")
            Hwv = -jnp.einsum("nba,nbc,n->ac", Rtn_jw, M, w,
                              precision="highest")
            Hvv = jnp.einsum("nab,n->ab", M, w, precision="highest")
            Mr = jnp.einsum("nab,nb->na", M, r, precision="highest")
            bw = jnp.einsum("nba,nb,n->a", Rtn_jw, Mr, w, precision="highest")
            bv = -jnp.einsum("na,n->a", Mr, w, precision="highest")
            H = jnp.block([[Hww, Hwv], [Hwv.T, Hvv]])
            b = jnp.concatenate([bw, bv])
            # the collective: reduce normal equations over the mesh
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            xi = linalg3.solve6(H, -b, damping=1e-6)
            T_new = se3.compose(se3.se3_exp(xi), T)
            delta = jnp.linalg.norm(xi)
            return (T_new, it + 1, delta, delta < trans_eps)

        def cond(state):
            _, it, _, done = state
            return (it < max_iter) & (~done)

        T, it, _, _ = jax.lax.while_loop(
            cond, body,
            (T0, jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False)))
        return T, it

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Batch-of-pairs data parallel registration
# ---------------------------------------------------------------------------

def batched_gicp_align(
    mesh, src_b, smask_b, dst_b, dmask_b, init_T_b, *,
    axis: str = "dp", max_iter: int = 32, max_corr_dist: float = 52.5,
):
    """B independent (src, dst) registrations, batch sharded over the mesh.

    Returns (transforms (B,4,4), fitness (B,), converged (B,)).
    """
    fn = _batched_gicp_jit(mesh, axis, int(max_iter), float(max_corr_dist))
    return fn(src_b, smask_b, dst_b, dmask_b, init_T_b)


@functools.lru_cache(maxsize=None)
def _batched_gicp_jit(mesh, axis, max_iter, max_corr_dist):
    def one(src, smask, dst, dmask, T0):
        # banded is safe under the outer vmap: knn_banded's custom_vmap
        # rule dispatches to the chip-proven grid-batched lowering
        # (ops/pallas_knn._banded_caller) instead of Mosaic's corrupt
        # auto-batching — proven by tools/prove_vmap_kernels.py on v5e
        res = gicp.align(src, smask, dst, dmask, init_T=T0,
                         max_iter=max_iter, max_corr_dist=max_corr_dist,
                         cov_backend="brute", banded=True)
        return res.transform, res.fitness, res.converged

    sharding = NamedSharding(mesh, P(axis))
    return jax.jit(jax.vmap(one),
                   in_shardings=(sharding,) * 5,
                   out_shardings=(sharding, sharding, sharding))


# ---------------------------------------------------------------------------
# Factor-sharded pose-graph solve
# ---------------------------------------------------------------------------

def pgo_optimize_sharded(
    mesh, poses, idx_i, idx_j, r, Ji, Jj, w6, valid, active, *,
    axis: str = "dp", pcg_iters: int = 64,
):
    """One linearized PGO solve with factors sharded over the mesh.

    Inputs are the per-factor arrays (as produced by ops.pgo._factor_data),
    sharded along the factor axis; poses/active replicated. Returns the
    replicated tangent update (N, 6)."""
    fn = _pgo_sharded_jit(mesh, axis, int(pcg_iters), int(poses.shape[0]))
    return fn(idx_i, idx_j, r, Ji, Jj, w6, valid, active)


@functools.lru_cache(maxsize=None)
def _pgo_sharded_jit(mesh, axis, pcg_iters, n_cap):
    return jax.jit(_make_pgo_solve(mesh, axis, pcg_iters, n_cap))


@functools.lru_cache(maxsize=None)
def _make_pgo_solve(mesh, axis, pcg_iters, n_cap):
    """shard_map'd linearized PGO solve (factors sharded, poses replicated):
    builds (b, block-Jacobi precond, matrix-free Hx) with psum-combined
    scatter-adds and runs PCG. Used directly by pgo_optimize_sharded and
    inside pgo_optimize_full's GN loop."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P()),
        out_specs=P(),
    )
    def solve(ii, jj, r_l, Ji_l, Jj_l, w_l, v_l, act):
        def hx(x):
            xi = x[ii]
            xj = x[jj]
            u = jnp.einsum("fab,fb->fa", Ji_l, xi, precision="highest") + \
                jnp.einsum("fab,fb->fa", Jj_l, xj, precision="highest")
            wu = u * w_l * v_l[:, None]
            out = jnp.zeros((n_cap, 6), x.dtype)
            out = out.at[ii].add(
                jnp.einsum("fba,fb->fa", Ji_l, wu, precision="highest"))
            out = out.at[jj].add(
                jnp.einsum("fba,fb->fa", Jj_l, wu, precision="highest"))
            return jax.lax.psum(out, axis) * act

        wr = r_l * w_l * v_l[:, None]
        b = jnp.zeros((n_cap, 6), r_l.dtype)
        b = b.at[ii].add(jnp.einsum("fba,fb->fa", Ji_l, wr,
                                    precision="highest"))
        b = b.at[jj].add(jnp.einsum("fba,fb->fa", Jj_l, wr,
                                    precision="highest"))
        b = jax.lax.psum(b, axis) * act

        # block-Jacobi preconditioner (psum-reduced diagonal blocks)
        WJi = Ji_l * (w_l * v_l[:, None])[:, :, None]
        WJj = Jj_l * (w_l * v_l[:, None])[:, :, None]
        Pk = jnp.zeros((n_cap, 6, 6), r_l.dtype)
        Pk = Pk.at[ii].add(jnp.einsum("fba,fbc->fac", Ji_l, WJi,
                                      precision="highest"))
        Pk = Pk.at[jj].add(jnp.einsum("fba,fbc->fac", Jj_l, WJj,
                                      precision="highest"))
        Pk = jax.lax.psum(Pk, axis) + 1e-6 * jnp.eye(6, dtype=r_l.dtype)
        Pinv = jnp.linalg.inv(Pk)

        def precond(v):
            return jnp.einsum("nab,nb->na", Pinv, v,
                              precision="highest") * act

        x = jnp.zeros((n_cap, 6), r_l.dtype)
        rr = -b
        z = precond(rr)
        p = z
        rz = jnp.sum(rr * z)
        rr0 = jnp.sum(rr * rr)

        # relative-residual early exit like ops.pgo.optimize: every scalar
        # here is replicated (b and hx outputs are psum-combined), so the
        # while condition agrees on all devices
        def cond(carry):
            _, rr_vec, _, _, _, it = carry
            res = jnp.sum(rr_vec * rr_vec)
            return (it < pcg_iters) & (res > 1e-10 * jnp.maximum(rr0, 1e-20))

        def body(carry):
            x, rr, z, p, rz, it = carry
            hp = hx(p)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * hp
            z = precond(rr)
            rz2 = jnp.sum(rr * z)
            beta = rz2 / jnp.maximum(rz, 1e-20)
            return (x, rr, z, p * beta + z, rz2, it + 1)

        x, *_ = jax.lax.while_loop(
            cond, body, (x, rr, z, p, rz, jnp.int32(0)))
        return x

    return solve


def pgo_optimize_full(mesh, graph, prior_var, odom_var, *,
                      axis: str = "dp", gn_iters: int = 3,
                      pcg_iters: int = 64, robust_delta: float = 1.0):
    """Full pose-graph Gauss-Newton with factor-sharded PCG solves.

    Semantics mirror ops.pgo.optimize (relinearize every GN iteration,
    Huber on loop factors, right-perturbation retraction on active nodes)
    but each linear solve runs with the factor arrays sharded over the
    mesh and the normal-equation scatter-adds psum-combined over ICI —
    the product path FastLioSamQnPipeline(mesh=...) switches to above
    PipelineConfig.pgo_shard_min_factors. Returns the updated GraphState.
    """
    fn = _pgo_full_jit(mesh, axis, int(gn_iters), int(pcg_iters),
                       float(robust_delta), int(graph.capacity),
                       int(graph.loop_i.shape[0]))
    return fn(graph, prior_var, odom_var)


@functools.lru_cache(maxsize=None)
def _pgo_full_jit(mesh, axis, gn_iters, pcg_iters, robust_delta,
                  n_cap, l_cap):
    from ..ops import pgo

    ndev = len(mesh.devices.flat)
    f_tot = n_cap + l_cap + 1  # odom + loops + prior (pgo._factor_data)
    pad = (-f_tot) % ndev
    solve = _make_pgo_solve(mesh, axis, pcg_iters, n_cap)

    def run(graph, prior_var, odom_var):
        active = (jnp.arange(n_cap) < graph.num_nodes)[:, None]
        act_f = active.astype(jnp.float32)

        def padz(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)

        def gn_step(_, g):
            idx_i, idx_j, r, Ji, Jj, w6, valid = pgo._factor_data(
                g, prior_var, odom_var)
            if robust_delta > 0:
                # shared with the single-device solver (pgo.huber_loop_
                # weights / pgo.gn_retract) so the two paths cannot diverge
                w6 = pgo.huber_loop_weights(r, w6, n_cap, l_cap,
                                            robust_delta)
            x = solve(padz(idx_i), padz(idx_j), padz(r), padz(Ji),
                      padz(Jj), padz(w6), padz(valid), act_f)
            return pgo.gn_retract(g, x, active)

        return jax.lax.fori_loop(0, gn_iters, gn_step, graph)

    # replicated output: the graph flows on into programs whose
    # in_shardings demand replication (e.g. the sharded loop-closure
    # batch passes the keyframe store replicated) — a dp-committed
    # output here would make those jit calls reject the arrays
    rep = NamedSharding(mesh, P())
    return jax.jit(run, out_shardings=rep)


# ---------------------------------------------------------------------------
# Mesh-sharded batched loop closure (the product path: pipeline loop_batch)
# ---------------------------------------------------------------------------

def make_sharded_loop_closure_batch(mesh, perform_impl, *,
                                    axis: str = "dp"):
    """Build (ONCE — cache the result; see LoopClosure) the jitted program
    running B independent loop-closure registrations (the FULL
    per-candidate pipeline: submap/scan build -> FPFH -> Quatro -> GICP)
    with the batch sharded over the mesh and the keyframe store
    replicated.

    perform_impl: LoopClosure._perform_impl (bound method). B must be a
    multiple of the mesh size (the pipeline pads with closest_idx = -1
    slots, which register as no-candidates)."""
    sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    # in/out_shardings are pytree PREFIXES: `rep` covers the whole store
    return jax.jit(
        jax.vmap(perform_impl, in_axes=(None, 0, 0)),
        in_shardings=(rep, sharding, sharding),
        out_shardings=sharding)
