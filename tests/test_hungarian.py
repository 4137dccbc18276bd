"""Matching: scipy host callback vs on-device auction (ops/hungarian.py)."""

import numpy as np

import jax.numpy as jnp

from embodiedscan_tpu.ops.hungarian import (_scipy_assign, auction_match,
                                            hungarian_match)


def _total(cost, gm, assigned):
    return sum(cost[q, g] for q, g in enumerate(assigned)
               if g >= 0 and gm[g])


class TestHungarianCallback:

    def test_matches_scipy_and_masks_padding(self):
        rng = np.random.RandomState(0)
        cost = rng.randn(16, 8).astype(np.float32)
        gm = np.array([True] * 5 + [False] * 3)
        got = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(gm)))
        # every valid gt assigned once, padded gts never
        cnt = np.bincount(got[got >= 0], minlength=8)
        assert (cnt[:5] == 1).all() and (cnt[5:] == 0).all()
        ref = _scipy_assign(np.where(gm[None, :], cost, 1e8))
        np.testing.assert_allclose(_total(cost, gm, got),
                                   _total(cost, gm, ref))

    def test_nan_costs_clamped(self):
        cost = np.full((4, 2), np.nan, np.float32)
        gm = np.ones(2, bool)
        got = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(gm)))
        assert (np.bincount(got[got >= 0], minlength=2) == 1).all()


class TestAuctionMatch:

    def test_optimal_on_random_instances(self):
        rng = np.random.RandomState(0)
        worst = 0.0
        for _ in range(20):
            q = int(rng.choice([8, 64, 256]))
            g = int(rng.choice([1, 4, min(q, 64)]))
            cost = rng.randn(q, g).astype(np.float32) * \
                float(rng.choice([0.1, 1, 10]))
            gm = rng.rand(g) < 0.8
            if not gm.any():
                gm[0] = True
            got = np.asarray(auction_match(jnp.asarray(cost),
                                           jnp.asarray(gm)))
            cnt = np.bincount(got[got >= 0], minlength=g)
            assert (cnt[gm] == 1).all() and (cnt[~gm] == 0).all()
            ref = _scipy_assign(np.where(gm[None, :], cost, 1e8))
            worst = max(worst,
                        _total(cost, gm, got) - _total(cost, gm, ref))
        # eps-optimality: within G * eps of the Hungarian optimum
        assert worst <= 64 * 1e-3 + 1e-5, worst

    def test_single_gt(self):
        cost = np.asarray([[3.0], [1.0], [2.0]], np.float32)
        got = np.asarray(auction_match(jnp.asarray(cost),
                                       jnp.ones(1, bool)))
        np.testing.assert_array_equal(got, [-1, 0, -1])

    def test_all_gts_masked(self):
        cost = np.zeros((4, 3), np.float32)
        got = np.asarray(auction_match(jnp.asarray(cost),
                                       jnp.zeros(3, bool)))
        np.testing.assert_array_equal(got, [-1, -1, -1, -1])
