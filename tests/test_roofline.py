"""Roofline accounting sanity (tools/roofline.py).

The budget math must be conservative in the only way that matters: the
host-side survivor matrix must keep every (block, tile) pair that
actually contains an in-radius point pair (a false prune would mean the
budget undercounts mandatory work — and would also indicate the kernels'
bbox test drops real neighbors)."""
import numpy as np
import pytest

from fast_lio_sam_qn_tpu.tools.roofline import (
    _block_tile_survivors, gicp_nn_budget, stage_budget)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    n = 2000
    p = np.concatenate([
        rng.uniform(-15, 15, (n, 3)).astype(np.float32),
        np.zeros((1072, 3), np.float32)])
    m = np.arange(len(p)) < n
    return p, m


def test_budget_shape_and_sanity(cloud):
    p, m = cloud
    for stage in ("moments", "spfh", "agg"):
        b = stage_budget(p, m, stage, 1.5)
        assert 0 < b["surviving"] <= b["total"]
        assert 0.0 < b["prune_keep"] <= 1.0
        assert b["bound_ms"] > 0.0
        assert b["vpu_gop"] > 0.0 and b["mxu_gflop"] > 0.0
    g = gicp_nn_budget(1000, 2000, iters=3)
    assert g["bound_ms"] > 0.0


def test_survivors_never_prune_real_pairs(cloud):
    """Every (block, tile) pair containing an actual in-radius point pair
    must survive — the prune may only drop provably-empty blocks."""
    import jax.numpy as jnp

    from fast_lio_sam_qn_tpu.ops import fpfh_stream as fs

    p, m = cloud
    r = 1.5
    surv = _block_tile_survivors(p, m, r)
    order = np.asarray(fs._morton_order(jnp.asarray(p), jnp.asarray(m)))
    ps, ms_ = p[order], m[order]
    n = len(ps)
    n_pad = -(-n // fs.TD) * fs.TD
    m_pad = -(-n // fs.TQ) * fs.TQ
    pp = np.pad(ps, ((0, n_pad - n), (0, 0)))
    vv = np.pad(ms_, (0, n_pad - n))
    qq = np.pad(ps, ((0, m_pad - n), (0, 0)))
    qv = np.pad(ms_, (0, m_pad - n))
    rng = np.random.default_rng(0)
    checked = 0
    for b in rng.choice(surv.shape[0], size=min(6, surv.shape[0]),
                        replace=False):
        qb = qq[b * fs.TQ:(b + 1) * fs.TQ]
        qm = qv[b * fs.TQ:(b + 1) * fs.TQ]
        for t in range(surv.shape[1]):
            db = pp[t * fs.TD:(t + 1) * fs.TD]
            dm = vv[t * fs.TD:(t + 1) * fs.TD]
            d2 = ((qb[:, None, :] - db[None, :, :]) ** 2).sum(-1)
            has = bool((d2[np.ix_(qm, dm)] <= r * r).any()) \
                if qm.any() and dm.any() else False
            if has:
                assert surv[b, t], (b, t)
                checked += 1
    assert checked > 0
