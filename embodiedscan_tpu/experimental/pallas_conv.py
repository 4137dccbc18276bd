"""Pallas TPU kernel: banded one-hot sparse convolution.

The sparse conv core is ``sum_k gather(feats, nbr[:, k]) @ W[k]``; XLA lowers
the row gathers to ~10 ns/row element loops (PERF.md). This kernel exploits
the engine invariant (coords key-sorted, so each offset's neighbor indices
are monotone): for a tile of TILE consecutive outputs, the needed input rows
lie in a narrow band ``[base, base + W)``. The band is DMA'd contiguously
into VMEM and the "gather" becomes a one-hot (TILE, W) x (W, C) matmul on the
MXU — FLOPs are cheap, random access is not.

Exactness: a neighbor outside the band cannot be silently dropped. The
wrapper computes per-(tile, offset) band coverage in XLA (two segment
reductions) and falls back to the gather formulation via ``lax.cond`` if any
band overflows — so results are always exact; the kernel is only a fast path.

Grid: (num_tiles,); the kernel statically unrolls the K offsets per tile,
sequentially DMA-ing each offset's band and accumulating on the MXU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
BAND = 1024


def _kernel(nbr_ref, feats_hbm, w_ref, out_ref, band_vmem, sem):
    n_in = feats_hbm.shape[0]
    n_off = nbr_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(n_off):  # static unroll over kernel offsets
        idx = nbr_ref[:, k]  # (TILE,) int32, -1 = absent
        valid = idx >= 0
        big = jnp.int32(2**30)
        base = jnp.min(jnp.where(valid, idx, big))
        base = jnp.clip(base, 0, max(n_in - BAND, 0))

        dma = pltpu.make_async_copy(feats_hbm.at[pl.ds(base, BAND)],
                                    band_vmem, sem)
        dma.start()

        rel = idx - base
        in_band = valid & (rel >= 0) & (rel < BAND)
        rel = jnp.where(in_band, rel, 0)
        onehot = (rel[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (TILE, BAND), 1)) & in_band[:, None]

        dma.wait()
        gathered = jnp.dot(onehot.astype(jnp.float32), band_vmem[:, :],
                           preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(gathered, w_ref[k],
                            preferred_element_type=jnp.float32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=('interpret',))
def banded_conv_pallas(feats: jax.Array, nbr: jax.Array, weights: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Banded one-hot conv over all offsets. Caller guarantees coverage.

    Args:
        feats: (N, C) input features (masked rows already zeroed; N >= BAND).
        nbr: (M, K) neighbor indices (-1 absent), M divisible by TILE,
            per-offset columns monotone with band spread < BAND per tile.
        weights: (K, C, Cout).

    Returns:
        (M, Cout) float32.
    """
    m, k = nbr.shape
    n, c = feats.shape
    cout = weights.shape[-1]
    assert m % TILE == 0 and n >= BAND
    # Mosaic requires HBM slice lanes aligned to 128: pad channel dims
    cpad = (-c) % 128
    opad = (-cout) % 128
    if cpad:
        feats = jnp.concatenate(
            [feats, jnp.zeros((n, cpad), feats.dtype)], axis=1)
        weights = jnp.concatenate(
            [weights, jnp.zeros((k, cpad, cout), weights.dtype)], axis=1)
        c += cpad
    if opad:
        weights = jnp.concatenate(
            [weights, jnp.zeros((k, c, opad), weights.dtype)], axis=2)
    grid = (m // TILE,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # full offset dim per block: TPU lowering wants the last block
            # dim either 128-divisible or the whole dimension
            pl.BlockSpec((TILE, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
            pl.BlockSpec((k, c, cout + opad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout + opad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cout + opad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BAND, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(nbr, feats, weights)[:, :cout]


def band_coverage_ok(nbr: jax.Array) -> jax.Array:
    """True iff every (tile, offset) band spread fits in BAND."""
    m, k = nbr.shape
    pad = (-m) % TILE
    if pad:
        nbr = jnp.concatenate(
            [nbr, jnp.full((pad, k), -1, nbr.dtype)])
    tiles = nbr.reshape(-1, TILE, k)
    big = jnp.int32(2**30)
    valid = tiles >= 0
    lo = jnp.min(jnp.where(valid, tiles, big), axis=1)  # (T, K)
    hi = jnp.max(jnp.where(valid, tiles, -1), axis=1)
    spread_ok = (hi - lo) < BAND
    return jnp.all(spread_ok | jnp.all(~valid, axis=1))


def gather_matmul_conv_fast(feats: jax.Array, mask: jax.Array,
                            nbr: jax.Array, weights: jax.Array,
                            bias: jax.Array | None = None,
                            interpret: bool = False) -> jax.Array:
    """Drop-in for ``sparse.gather_matmul_conv``: Pallas fast path with an
    exact XLA fallback when any band overflows (lax.cond picks at runtime)."""
    from ..ops.sparse import gather_matmul_conv
    m, k = nbr.shape
    n, c = feats.shape
    if n < BAND or m % TILE != 0:
        return gather_matmul_conv(feats, mask, nbr, weights, bias)
    safe = jnp.where(mask[:, None], feats, 0).astype(jnp.float32)

    def fast(_):
        return banded_conv_pallas(safe, nbr, weights.astype(jnp.float32),
                                  interpret=interpret)

    def slow(_):
        return gather_matmul_conv(feats, mask, nbr, weights)

    out = jax.lax.cond(band_coverage_ok(nbr), fast, slow, None)
    if bias is not None:
        out = out + bias
    return out
