"""Pallas TPU prefix-scan kernels for the sparse engine's merge joins.

The cummax join in ``hashing.lookup_merge(_multi)`` needs, per lookup pair,
two running maxima over the merged sort order (last table key / last table
row at-or-before each position). ``jax.lax.cummax`` lowers to a
reduce-window ladder (log-n full passes over HBM, traced ~0.19 ns/elem);
a sequential-grid Pallas scan reads the merged arrays ONCE and emits every
pair's masked cummaxes in the same pass:

- block-local prefix max: 7 shifted-max steps across lanes + log2(SUB)
  steps across sublanes (VPU elementwise, compute-negligible),
- a carry scalar per output in SMEM scratch, updated per grid step (the
  TPU grid is sequential, so scratch persists across steps).

Bytes per element drop from ~(2K cummaxes x log-n passes) to
(8 read + 8K written), i.e. the join runs at HBM bandwidth.

Falls back to ``lax.cummax`` off-TPU (CPU tests) — results are identical.
"""

import functools
import os

import jax
import jax.numpy as jnp

_IMIN = jnp.iinfo(jnp.int32).min
_LANES = 128
_SUB = 256  # sublanes per block: block = 256 x 128 = 32768 elements


def _use_pallas() -> bool:
    env = os.environ.get('EMBODIEDSCAN_PALLAS', '')
    if env in ('0', '1'):
        return env == '1'
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:  # noqa: BLE001 - no backend yet
        return False


def _block_cummax(v, fill):
    """Row-major inclusive prefix max of a (SUB, 128) block."""
    sub = v.shape[0]
    s = 1
    while s < _LANES:
        pad = jnp.full((sub, s), fill, v.dtype)
        v = jnp.maximum(v, jnp.concatenate([pad, v[:, :_LANES - s]], 1))
        s *= 2
    # inclusive prefix over row totals, then exclusive-shift down one row.
    # Mosaic cannot shift (SUB, 1) vectors along sublanes ("offset mismatch
    # on non-concat dimension"), so the totals ride full-width tiles.
    t = jnp.broadcast_to(v[:, _LANES - 1:_LANES], (sub, _LANES))
    s = 1
    while s < sub:
        pad = jnp.full((s, _LANES), fill, v.dtype)
        t = jnp.maximum(t, jnp.concatenate([pad, t[:sub - s]], 0))
        s *= 2
    exc = jnp.concatenate(
        [jnp.full((1, _LANES), fill, v.dtype), t[:sub - 1]], 0)
    return jnp.maximum(v, exc)


def _join_scan_kernel(ranges, sentinel_bits, key_ref, aux_ref,
                      *out_and_scratch):
    from jax.experimental import pallas as pl
    k = len(ranges)
    outs = out_and_scratch[:2 * k]
    carry = out_and_scratch[2 * k]  # SMEM (2K,) int32

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in range(k):
            carry[2 * r] = _IMIN
            carry[2 * r + 1] = -1

    key = key_ref[:]
    aux = aux_ref[:]
    not_sent = True
    if sentinel_bits:
        # batched sentinel rows: low coord bits all-ones (hashing.py
        # _coord_sentinel_mask); key ^ INT32_MIN undoes the order-preserving
        # bias flip
        u = key ^ jnp.int32(_IMIN)
        not_sent = (u & jnp.int32(sentinel_bits)) != jnp.int32(sentinel_bits)
    for r, (lo, hi) in enumerate(ranges):
        sel = (aux >= lo) & (aux < hi) & not_sent
        vk = _block_cummax(jnp.where(sel, key, _IMIN), _IMIN)
        vr = _block_cummax(jnp.where(sel, aux, -1), -1)
        ck = carry[2 * r]
        cr = carry[2 * r + 1]
        vk = jnp.maximum(vk, ck)
        vr = jnp.maximum(vr, cr)
        outs[2 * r][:] = vk
        outs[2 * r + 1][:] = vr
        carry[2 * r] = jnp.max(vk[_SUB - 1:_SUB, _LANES - 1:_LANES])
        carry[2 * r + 1] = jnp.max(vr[_SUB - 1:_SUB, _LANES - 1:_LANES])


@functools.partial(jax.jit, static_argnames=('ranges', 'sentinel_bits'))
def _join_scan_pallas(skey, saux, ranges, sentinel_bits):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = skey.shape[0]
    block = _SUB * _LANES
    n_pad = -(-n // block) * block
    grid = n_pad // block
    # pad aux outside every range so padding never wins a cummax
    key_p = jnp.pad(skey, (0, n_pad - n), constant_values=_IMIN)
    aux_p = jnp.pad(saux, (0, n_pad - n),
                    constant_values=_IMIN).reshape(grid * _SUB, _LANES)
    key_p = key_p.reshape(grid * _SUB, _LANES)
    k = len(ranges)
    spec = pl.BlockSpec((_SUB, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_join_scan_kernel, ranges, sentinel_bits),
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=[spec] * (2 * k),
        out_shape=[jax.ShapeDtypeStruct((grid * _SUB, _LANES), jnp.int32)
                   ] * (2 * k),
        scratch_shapes=[pltpu.SMEM((2 * k,), jnp.int32)],
        interpret=os.environ.get('EMBODIEDSCAN_PALLAS_INTERPRET') == '1',
    )(key_p, aux_p)
    res = []
    for r in range(k):
        res.append((outs[2 * r].reshape(-1)[:n],
                    outs[2 * r + 1].reshape(-1)[:n]))
    return res


def _join_scan_lax(skey, saux, ranges, sentinel_bits):
    not_sent = True
    if sentinel_bits:
        u = skey ^ jnp.int32(_IMIN)
        not_sent = (u & jnp.int32(sentinel_bits)) != jnp.int32(sentinel_bits)
    res = []
    for lo, hi in ranges:
        sel = (saux >= lo) & (saux < hi) & not_sent
        res.append((jax.lax.cummax(jnp.where(sel, skey, _IMIN)),
                    jax.lax.cummax(jnp.where(sel, saux, -1))))
    return res


def join_scan(skey, saux, ranges, sentinel_bits: int = 0):
    """Masked cummax pairs for the merge join.

    Args:
        skey: (N,) int32 sorted merged keys.
        saux: (N,) int32 merged aux (table rows in their concat ranges).
        ranges: static tuple of (lo, hi) — per lookup pair, the half-open
            aux interval holding that pair's table rows.
        sentinel_bits: if nonzero, additionally exclude rows whose key has
            ALL of these low bits set (batched-key sentinel rows).

    Returns:
        list of (lkey, lrow) per range: running max of the masked key/aux —
        i.e. the last table entry at-or-before each merged position.
    """
    ranges = tuple((int(lo), int(hi)) for lo, hi in ranges)
    # two's-complement wrap: the mask is a bit pattern, not a magnitude
    # (b=1 keys use all 32 bits -> mask 0xFFFFFFFF -> int32 -1)
    sbits = int(sentinel_bits) & 0xFFFFFFFF
    if sbits >= 1 << 31:
        sbits -= 1 << 32
    if _use_pallas():
        return _join_scan_pallas(skey, saux, ranges, sbits)
    return _join_scan_lax(skey, saux, ranges, sbits)
