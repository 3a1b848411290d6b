"""Exact brute-force kNN — tiled, masked, MXU-friendly.

The cross term of the squared distance matrix is a matmul
(|q|^2 - 2 q.d^T + |d|^2), so the heavy lifting lands on the MXU; queries are
processed in static chunks so the (chunk, N_db) distance tile bounds memory.

Used for (a) exact-parity registration paths and recall tests against the
windowed hash-grid kNN (ops/hashgrid.py), and (b) feature-space matching
(FPFH descriptors are 33-dim where a voxel window does not apply) — the
counterpart of the reference's NanoFLANN/PCL kd-tree searches
(loop_closure.cpp:120-133, Quatro correspondence matching [external]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dist2_tile(q: jax.Array, d: jax.Array) -> jax.Array:
    """(m, F), (n, F) -> (m, n) squared euclidean distances.

    precision="highest" is load-bearing on TPU: the default bf16 operand
    passes put O(1) absolute error on d2 at world-coordinate magnitudes
    and flip a majority of near-tied NN picks (see ops/pallas_knn.py)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    dd = jnp.sum(d * d, axis=-1)[None, :]
    cross = jnp.dot(q, d.T, preferred_element_type=jnp.float32,
                    precision="highest")
    return jnp.maximum(qq - 2.0 * cross + dd, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def brute_knn(
    queries: jax.Array,
    qmask: jax.Array,
    db: jax.Array,
    dbmask: jax.Array,
    k: int,
    chunk: int = 1024,
):
    """Exact kNN of `queries` in `db`.

    Args:
      queries: (M, F) f32; qmask: (M,) bool
      db: (N, F) f32; dbmask: (N,) bool
      k: neighbors (static); chunk: query tile size (static)

    Returns:
      (dist2 (M, k) f32 — inf where invalid, idx (M, k) i32 — -1 where
      invalid, valid (M, k) bool)
    """
    m = queries.shape[0]
    pad = (-m) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    qm = jnp.pad(qmask, (0, pad))
    nchunks = q.shape[0] // chunk
    q = q.reshape(nchunks, chunk, -1)
    qm = qm.reshape(nchunks, chunk)

    inf_row = jnp.where(dbmask, 0.0, jnp.inf)[None, :]

    def one_chunk(args):
        qc, qmc = args
        d2 = _dist2_tile(qc, db) + inf_row
        d2 = jnp.where(qmc[:, None], d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx.astype(jnp.int32)

    d2, idx = jax.lax.map(one_chunk, (q, qm))
    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    valid = jnp.isfinite(d2)
    return d2, jnp.where(valid, idx, -1), valid


@functools.partial(jax.jit, static_argnames=("chunk",))
def brute_nn(
    queries: jax.Array,
    qmask: jax.Array,
    db: jax.Array,
    dbmask: jax.Array,
    chunk: int = 2048,
):
    """Exact single nearest neighbor. Returns (dist2 (M,), idx (M,), valid)."""
    d2, idx, valid = brute_knn(queries, qmask, db, dbmask, k=1, chunk=chunk)
    return d2[:, 0], idx[:, 0], valid[:, 0]
