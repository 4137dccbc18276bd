"""Scatter-free segment reduction and the gather custom-VJP built on it.

XLA's autodiff of a row gather is a scatter-add, which lowers to an
element-by-element loop on TPU: the point-image fusion backward (grad wrt
the image feature maps, ``models/fusion.py``) measured **180 ms** for
983k x 64 rows on v5e — half the full train step (r3 trace, PERF.md).
The same transpose computed as sort -> cumsum -> prefix-difference costs
~25 ms, because every piece is a TPU-native streaming op (measured: 2-op
sort 2.5 ms/M rows, f32 cumsum over (1M, 64) 7 ms, row gathers 2.5-4
ns/row, while scatter runs ~3 ns/ELEMENT serially).

``segment_sum_rows`` is exact up to f32 prefix-difference rounding (the
cumsum runs in f32; relative error ~1e-7 x segment-prefix ratio).

These are FLAT ops: call them on the full flattened batch, never under
``jax.vmap`` (a vmapped sort pays the ~12x batched-sort penalty that this
module exists to avoid).
"""

import jax
import jax.numpy as jnp


def segment_sum_rows(ids: jax.Array, vals: jax.Array,
                     n_out: int) -> jax.Array:
    """Sum rows of ``vals`` by ``ids`` into an (n_out, C) table, no scatter.

    Args:
        ids: (Q,) int32 target rows; out-of-range ids are dropped.
        vals: (Q, C) rows to accumulate.
        n_out: static output row count.

    Returns:
        (n_out, C) per-id sums, in ``vals``' dtype (f32 accumulation).
    """
    q, c = vals.shape
    key = jnp.where((ids >= 0) & (ids < n_out), ids, n_out)
    skey, perm = jax.lax.sort(
        (key, jnp.arange(q, dtype=jnp.int32)), num_keys=1)
    svals = jnp.where((skey < n_out)[:, None], vals[perm], 0)
    prefix = jnp.cumsum(svals.astype(jnp.float32), axis=0)
    prefix = jnp.concatenate(
        [jnp.zeros((1, c), prefix.dtype), prefix])  # prefix[k] = sum rows<k
    # start_p (= #rows with id < p) for every p via ONE merged probe sort:
    # probe keys 2p sort just before row keys 2p+1, so a probe's merged
    # position minus its own ordinal is exactly start_p. A second sort
    # un-permutes (positions of probes are the trailing block of aux).
    n_probe = n_out + 1  # the n_out probe delimits the dropped-rows tail
    pk = jnp.concatenate(
        [skey * 2 + 1, jnp.arange(n_probe, dtype=jnp.int32) * 2])
    aux = jnp.arange(q + n_probe, dtype=jnp.int32)
    _, sa = jax.lax.sort((pk, aux), num_keys=2)
    _, pos = jax.lax.sort((sa, jnp.arange(q + n_probe, dtype=jnp.int32)),
                          num_keys=1)
    starts = pos[q:] - jnp.arange(n_probe, dtype=jnp.int32)  # (n_out+1,)
    bounds = prefix[starts]  # (n_out+1, C) single row gather
    return (bounds[1:] - bounds[:-1]).astype(vals.dtype)


@jax.custom_vjp
def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[(Q,) idx]`` with a sort-based (scatter-free) backward.

    ``idx`` must already be clipped to [0, table.shape[0]). FLAT op — do
    not vmap (see module docstring); flatten batch dims into Q instead.
    """
    return table[idx]


def _gather_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_bwd(res, dout):
    idx, p = res
    return segment_sum_rows(idx, dout, p), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
