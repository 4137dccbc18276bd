"""Pallas join-scan kernel vs the lax.cummax reference (ops/pscan.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from embodiedscan_tpu.ops import pscan


def _random_case(rng, n, k, sentinel_bits):
    skey = jnp.asarray(
        np.sort(rng.randint(-2**31, 2**31 - 1, n)).astype(np.int32))
    saux = jnp.asarray(rng.permutation(n).astype(np.int32))
    cuts = sorted(rng.choice(n, 2 * k, replace=False))
    ranges = tuple((cuts[2 * i], cuts[2 * i + 1]) for i in range(k))
    return skey, saux, ranges


class TestJoinScan:

    @pytest.mark.parametrize('n,k,sbits', [
        (1000, 1, 0),          # single range, smaller than one block
        (70001, 3, 0),         # multi-block + pad path (odd length)
        (40000, 2, (1 << 30) - 1),  # sentinel-bit exclusion
    ])
    def test_pallas_matches_lax(self, monkeypatch, n, k, sbits):
        rng = np.random.RandomState(n + k)
        skey, saux, ranges = _random_case(rng, n, k, sbits)
        want = pscan._join_scan_lax(skey, saux, ranges, sbits)
        monkeypatch.setenv('EMBODIEDSCAN_PALLAS_INTERPRET', '1')
        got = pscan._join_scan_pallas(skey, saux, ranges, sbits)
        for (wk, wr), (gk, gr) in zip(want, got):
            np.testing.assert_array_equal(np.asarray(gk), np.asarray(wk))
            np.testing.assert_array_equal(np.asarray(gr), np.asarray(wr))

    def test_dispatch_uses_lax_on_cpu(self):
        # CPU backend (tests force it): join_scan must take the lax path
        skey = jnp.asarray(np.arange(100, dtype=np.int32))
        saux = jnp.asarray(np.arange(100, dtype=np.int32))
        out = pscan.join_scan(skey, saux, ((0, 50),))
        lk, lr = out[0]
        np.testing.assert_array_equal(
            np.asarray(lr), np.minimum(np.arange(100), 49))
