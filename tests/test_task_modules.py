"""Anchor generators, match costs, ChannelMapper (SURVEY §2a #27/#32/#39)."""

import numpy as np

import jax
import jax.numpy as jnp

from embodiedscan_tpu.models.anchors import (AlignedAnchor3DRangeGenerator,
                                             Anchor3DRangeGenerator)
from embodiedscan_tpu.models.match_costs import (bbox3d_l1_cost,
                                                 binary_focal_cost,
                                                 focal_loss_cost,
                                                 mask_focal_loss_cost,
                                                 token_map_cost)


class TestAnchorGenerators:

    def test_basic_shapes(self):
        gen = Anchor3DRangeGenerator(ranges=[[0, 0, 0, 4, 4, 2]],
                                     sizes=[[1.0, 1.0, 1.0]],
                                     rotations=[0.0, 1.5707963])
        a = gen.anchors_single_range((2, 4, 4), [0, 0, 0, 4, 4, 2])
        assert a.shape == (2, 4, 4, 1, 2, 7)
        # centers span the full range inclusively (linspace semantics)
        np.testing.assert_allclose(a[..., 0].min(), 0.0)
        np.testing.assert_allclose(a[..., 0].max(), 4.0)
        out = gen.grid_anchors([(2, 4, 4)])
        assert out[0].shape == (2 * 4 * 4 * 2, 7)

    def test_multi_size_ranges(self):
        gen = Anchor3DRangeGenerator(ranges=[[0, 0, 0, 4, 4, 2]],
                                     sizes=[[1, 1, 1], [2, 2, 2]],
                                     rotations=[0.0])
        assert gen.num_base_anchors == 2
        a = gen.single_level_grid_anchors((1, 2, 2), 1)
        assert a.shape == (1, 2, 2, 2, 1, 7)
        np.testing.assert_allclose(a[..., 0, 0, 3:6], 1.0)
        np.testing.assert_allclose(a[..., 1, 0, 3:6], 2.0)

    def test_aligned_centers(self):
        gen = AlignedAnchor3DRangeGenerator(ranges=[[0, 0, 0, 4, 4, 2]],
                                            sizes=[[1.0, 1.0, 1.0]],
                                            rotations=[0.0])
        a = gen.anchors_single_range((2, 4, 4), [0, 0, 0, 4, 4, 2])
        # voxel centers: x in {0.5, 1.5, 2.5, 3.5}, z in {0.5, 1.5}
        np.testing.assert_allclose(np.unique(a[..., 0]),
                                   [0.5, 1.5, 2.5, 3.5])
        np.testing.assert_allclose(np.unique(a[..., 2]), [0.5, 1.5])

    def test_aligned_corner(self):
        gen = AlignedAnchor3DRangeGenerator(ranges=[[0, 0, 0, 4, 4, 2]],
                                            sizes=[[1.0, 1.0, 1.0]],
                                            rotations=[0.0],
                                            align_corner=True)
        a = gen.anchors_single_range((2, 4, 4), [0, 0, 0, 4, 4, 2])
        np.testing.assert_allclose(np.unique(a[..., 0]), [0, 1, 2, 3])


class TestMatchCosts:

    def test_l1_cost(self):
        p = jnp.zeros((3, 9))
        g = jnp.ones((2, 9))
        np.testing.assert_allclose(np.asarray(bbox3d_l1_cost(p, g)), 9.0)

    def test_focal_cost_prefers_confident(self):
        logits = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
        labels = jnp.asarray([0, 1])
        c = np.asarray(focal_loss_cost(logits, labels))
        assert c[0, 0] < c[1, 0] and c[1, 1] < c[0, 1]

    def test_token_map_cost(self):
        q = jnp.asarray([[1.0, 0.0]])
        g = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
        np.testing.assert_allclose(np.asarray(token_map_cost(q, g)),
                                   [[0.5, 1.0]])

    def test_mask_focal_matches_binary_when_unmasked(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(4, 6).astype(np.float32))
        maps = jnp.asarray((rng.rand(3, 6) > 0.5).astype(np.float32))
        full = binary_focal_cost(logits, maps, jnp.ones((6,), bool))
        ref = mask_focal_loss_cost(logits, maps) * 6
        np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                                   rtol=1e-5)

    def test_binary_focal_ignores_masked_tokens(self):
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(4, 6).astype(np.float32))
        maps = jnp.asarray((rng.rand(3, 6) > 0.5).astype(np.float32))
        tm = jnp.asarray([True, True, True, False, False, False])
        got = binary_focal_cost(logits, maps, tm)
        # recompute on the visible slice only
        want = binary_focal_cost(logits[:, :3], maps[:, :3],
                                 jnp.ones((3,), bool))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5)


class TestChannelMapper:

    def test_maps_channels(self):
        from embodiedscan_tpu.models.sparse_nn import ChannelMapper
        from embodiedscan_tpu.ops import sparse as S
        rng = np.random.RandomState(0)
        sts = []
        for n, c in ((32, 8), (16, 12)):
            coords = jnp.asarray(rng.randint(0, 10, (1, n, 3)), jnp.int32)
            feats = jnp.asarray(rng.randn(1, n, c).astype(np.float32))
            mask = jnp.asarray(np.arange(n)[None] < n - 2)
            sts.append(S.SparseTensor(coords, feats, mask))
        mod = ChannelMapper(out_channels=16)
        vars_ = mod.init(jax.random.PRNGKey(0), sts, train=False)
        outs, _ = mod.apply(vars_, sts, train=True, mutable=['batch_stats'])
        assert len(outs) == 2
        for st, out in zip(sts, outs):
            assert out.feats.shape == st.feats.shape[:2] + (16,)
            # padded rows stay zero
            np.testing.assert_allclose(
                np.asarray(out.feats)[~np.asarray(out.mask)], 0)


class TestMaxPoolSlices:

    def test_matches_reduce_window(self):
        """max_pool_3x3_s2 (shifted-slice form) vs flax nn.max_pool, even
        and odd spatial sizes, values and gradients."""
        import flax.linen as nn
        from embodiedscan_tpu.models.resnet2d import max_pool_3x3_s2
        rng = np.random.RandomState(0)
        for h, w in ((8, 8), (9, 7), (6, 10)):
            x = jnp.asarray(rng.randn(2, h, w, 5).astype(np.float32))
            want = nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
            got = max_pool_3x3_s2(x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       err_msg=f'{h}x{w}')
            g_want = jax.grad(lambda a: jnp.sum(
                nn.max_pool(a, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1))) ** 2))(x)
            g_got = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a) ** 2))(x)
            np.testing.assert_allclose(np.asarray(g_got),
                                       np.asarray(g_want), rtol=1e-6,
                                       err_msg=f'grad {h}x{w}')

    def test_tie_routes_to_single_element(self):
        """On a tied plateau (e.g. post-ReLU zeros) the custom VJP routes
        each output gradient to exactly ONE input element — the first max in
        window scan order (torch MaxPool2d semantics) — so the total
        gradient mass is conserved, never multiplied across ties."""
        from embodiedscan_tpu.models.resnet2d import max_pool_3x3_s2
        x = jnp.zeros((1, 6, 6, 1), jnp.float32)  # all-tie plateau
        g = jax.grad(lambda a: jnp.sum(max_pool_3x3_s2(a)))(x)
        g = np.asarray(g)[0, :, :, 0]
        # 3x3 output windows, each routed once: total mass == 9
        assert g.sum() == 9.0, g
        # first-max scan order: window (wy,wx) covers rows 2wy-1..2wy+1;
        # the first in-bounds element is (max(2wy-1,0), max(2wx-1,0))
        want = np.zeros((6, 6))
        for wy in range(3):
            for wx in range(3):
                want[max(2 * wy - 1, 0), max(2 * wx - 1, 0)] += 1
        np.testing.assert_array_equal(g, want)
