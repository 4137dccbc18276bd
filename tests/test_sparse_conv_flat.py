"""Flat-batch SparseConv vs vmapped per-sample kernels (ADVICE r3 #3).

``models/sparse_nn.py:SparseConv`` flattens samples into the row space
(absolute row = local row + sample*N, t_nbr coarse-row offsets) instead of
vmapping the custom-VJP conv kernels. This pins values AND gradients of the
module against ``jax.vmap`` of the per-sample kernels at b=3, for all three
branches: submanifold, strided-with-transpose-table, and generic
gather-matmul.
"""

import numpy as np

import jax
import jax.numpy as jnp

import embodiedscan_tpu.ops.sparse as S
from embodiedscan_tpu.models.sparse_nn import (SparseConv, bdownsample,
                                               bneighbor_table, stage_tables)

B, N, C, CO = 3, 160, 8, 12


def _batched_st(seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0, 4, (B, N, 3)).astype(np.float32)
    feats = rng.randn(B, N, C).astype(np.float32)
    mask = rng.rand(B, N) > 0.15
    return S.from_points_b(jnp.asarray(pts), jnp.asarray(feats),
                           jnp.asarray(mask), 0.25, 96)


def _grads(fn, *args, argnums=(0, 1)):
    out = fn(*args)
    cot = jnp.asarray(
        np.random.RandomState(9).randn(*out.shape).astype(np.float32))
    g = jax.grad(lambda *a: jnp.sum(fn(*a) * cot), argnums=argnums)(*args)
    return out, g


class TestSparseConvFlatVsVmap:

    def _check(self, branch, flat_fn, ref_fn, feats, w):
        (out_f, (gf_f, gw_f)) = _grads(flat_fn, feats, w)
        (out_r, (gf_r, gw_r)) = _grads(ref_fn, feats, w)
        np.testing.assert_allclose(out_f, out_r, rtol=1e-5, atol=1e-5,
                                   err_msg=f'{branch} fwd')
        np.testing.assert_allclose(gf_f, gf_r, rtol=1e-5, atol=1e-5,
                                   err_msg=f'{branch} dfeats')
        np.testing.assert_allclose(gw_f, gw_r, rtol=1e-4, atol=1e-4,
                                   err_msg=f'{branch} dw')

    def test_submanifold(self):
        st = _batched_st()
        nbr = bneighbor_table(st, S.OFFSETS_3)
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(27, C, CO).astype(np.float32) * 0.1)
        mod = SparseConv(features=CO, kernel_size=27)

        def flat_fn(f, w_):
            return mod.apply({'params': {'kernel': w_}}, f, st.mask, nbr)

        def ref_fn(f, w_):
            out = jax.vmap(S.subm_gather_conv,
                           in_axes=(0, 0, 0, None))(f, st.mask, nbr, w_)
            return jnp.where(st.mask[..., None], out, 0)

        self._check('subm', flat_fn, ref_fn, st.feats, w)

    def test_strided_with_transpose_table(self):
        st = _batched_st(2)
        dmap = bdownsample(st, 64)
        s_nbr, _, t_nbr = stage_tables(st, dmap, with_transpose=True)
        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(27, C, CO).astype(np.float32) * 0.1)
        mod = SparseConv(features=CO, kernel_size=27)

        def flat_fn(f, w_):
            return mod.apply({'params': {'kernel': w_}}, f, st.mask, s_nbr,
                             out_mask=dmap.mask, t_nbr=t_nbr)

        def ref_fn(f, w_):
            out = jax.vmap(S.strided_gather_conv,
                           in_axes=(0, 0, 0, 0, None))(f, st.mask, s_nbr,
                                                       t_nbr, w_)
            return jnp.where(dmap.mask[..., None], out, 0)

        self._check('strided', flat_fn, ref_fn, st.feats, w)

    def test_generic_gather_matmul(self):
        st = _batched_st(4)
        dmap = bdownsample(st, 64)
        s_nbr, _, _ = stage_tables(st, dmap, with_transpose=False)
        rng = np.random.RandomState(5)
        w = jnp.asarray(rng.randn(27, C, CO).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.randn(CO).astype(np.float32))
        mod = SparseConv(features=CO, kernel_size=27, use_bias=True)

        def flat_fn(f, w_):
            return mod.apply({'params': {'kernel': w_, 'bias': bias}}, f,
                             st.mask, s_nbr, out_mask=dmap.mask)

        def ref_fn(f, w_):
            out = jax.vmap(S.gather_matmul_conv,
                           in_axes=(0, 0, 0, None, None))(f, st.mask, s_nbr,
                                                          w_, bias)
            return jnp.where(dmap.mask[..., None], out, 0)

        self._check('generic', flat_fn, ref_fn, st.feats, w)
