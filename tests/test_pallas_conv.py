"""Banded Pallas conv vs the gather-matmul oracle (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from embodiedscan_tpu.experimental import pallas_conv as PC
from embodiedscan_tpu.ops import sparse as S


def make_case(rng, n=2048, m=1024, k=27, c=16, cout=8, local=True):
    feats = rng.randn(n, c).astype(np.float32)
    mask = np.ones(n, bool)
    mask[n - 50:] = False
    if local:
        # monotone, near-diagonal neighbor indices (the engine's real shape)
        base = np.sort(rng.randint(0, n - 200, m))
        nbr = base[:, None] + rng.randint(0, 128, (m, k))
        nbr = np.minimum(nbr, n - 1)
    else:
        nbr = rng.randint(0, n, (m, k))
    drop = rng.rand(m, k) < 0.3
    nbr = np.where(drop, -1, nbr).astype(np.int32)
    w = (rng.randn(k, c, cout) * 0.1).astype(np.float32)
    return (jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(nbr),
            jnp.asarray(w))


class TestPallasConv:

    def test_matches_oracle_interpret(self):
        rng = np.random.RandomState(0)
        feats, mask, nbr, w = make_case(rng)
        want = S.gather_matmul_conv(feats, mask, nbr, w)
        assert bool(PC.band_coverage_ok(nbr))
        got = PC.banded_conv_pallas(
            jnp.where(mask[:, None], feats, 0), nbr, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)

    def test_fallback_on_overflow(self):
        rng = np.random.RandomState(1)
        feats, mask, nbr, w = make_case(rng, local=False)  # wild indices
        assert not bool(PC.band_coverage_ok(nbr))
        want = S.gather_matmul_conv(feats, mask, nbr, w)
        got = PC.gather_matmul_conv_fast(feats, mask, nbr, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)

    def test_fast_path_with_bias(self):
        rng = np.random.RandomState(2)
        feats, mask, nbr, w = make_case(rng)
        bias = jnp.asarray(rng.randn(w.shape[-1]).astype(np.float32))
        want = S.gather_matmul_conv(feats, mask, nbr, w, bias)
        got = PC.gather_matmul_conv_fast(feats, mask, nbr, w, bias,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)

    def test_all_absent_tile(self):
        rng = np.random.RandomState(3)
        feats, mask, nbr, w = make_case(rng)
        nbr = nbr.at[:PC.TILE].set(-1)  # whole first tile absent
        want = S.gather_matmul_conv(feats, mask, nbr, w)
        got = PC.gather_matmul_conv_fast(feats, mask, nbr, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)
