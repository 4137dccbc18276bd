"""Equivalence of the bmap batching strategies (VERDICT r2 weak #7 / #1).

The shipping TPU mode is 'flat' (batch id packed in the sort key, one flat
sort over B*N rows), with 'unroll'/'scan'/'vmap' as per-sample fallbacks.
This runs a tiny from_points -> submanifold conv -> downsample -> strided
conv -> topk chain (every sort-carrying engine op) under all four modes and
asserts the outputs match the 'unroll' reference.
"""

import numpy as np
import pytest

import embodiedscan_tpu.ops.sparse as S


def _chain(points, feats, mask, weights_s, weights_d):
    """Voxelize -> subm conv -> downsample -> strided conv -> topk."""
    import jax
    import jax.numpy as jnp
    from embodiedscan_tpu.models.sparse_nn import (bdownsample,
                                                   bneighbor_table,
                                                   fpn_tables_merge,
                                                   stage_tables)

    if S.BMAP_MODE == 'flat':
        st = S.from_points_b(points, feats, mask, 0.25, 96)
    else:
        st = S.bmap(S.from_points, (0, 0, 0, None, None))(
            points, feats, mask, 0.25, 96)
    nbr = bneighbor_table(st, S.OFFSETS_3)
    f1 = jax.vmap(S.subm_gather_conv, in_axes=(0, 0, 0, None))(
        st.feats, st.mask, nbr, weights_s)
    st = S.SparseTensor(st.coords, jnp.where(st.mask[..., None], f1, 0),
                        st.mask)
    dmap = bdownsample(st, 64)
    s_nbr, c_nbr, t_nbr = stage_tables(st, dmap, with_transpose=True)
    f2 = jax.vmap(S.gather_matmul_conv, in_axes=(0, 0, 0, None, None))(
        st.feats, st.mask, s_nbr, weights_d, None)
    st2 = S.SparseTensor(dmap.coords,
                         jnp.where(dmap.mask[..., None], f2, 0), dmap.mask)
    score = jnp.sum(st2.feats, -1)
    kept = S.btopk_select(st2, score, 32)
    # FPN-level fused tables (children conv + lateral join + prune interp)
    nbr_u, lat_idx, interp_idx = fpn_tables_merge(st, st, st2.coords,
                                                  st2.mask)
    return (st.coords, st.feats, st.mask, c_nbr, t_nbr, kept.coords,
            kept.feats, kept.mask, nbr_u, lat_idx, interp_idx)


@pytest.mark.parametrize('mode', ['flat', 'scan', 'vmap'])
def test_bmap_modes_equivalent(mode):
    rng = np.random.RandomState(0)
    b, n, c = 3, 200, 8
    points = rng.uniform(0, 4, (b, n, 3)).astype(np.float32)
    feats = rng.randn(b, n, c).astype(np.float32)
    mask = rng.rand(b, n) > 0.1
    w_s = rng.randn(27, c, c).astype(np.float32) * 0.1
    w_d = rng.randn(27, c, c).astype(np.float32) * 0.1

    prev = S.BMAP_MODE
    try:
        S.set_bmap_mode('unroll')
        ref = _chain(points, feats, mask, w_s, w_d)
        S.set_bmap_mode(mode)
        got = _chain(points, feats, mask, w_s, w_d)
    finally:
        S.set_bmap_mode(prev)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=1e-5, atol=1e-5)
