"""Static-shape coordinate hashing for the sparse voxel engine.

TPU-native replacement for MinkowskiEngine's coordinate manager
(reference dependency, SURVEY.md §2b): integer voxel coordinates are packed
into a two-int32 lexicographic key, sorted once per level with
``jax.lax.sort``, and all membership queries (conv neighbor lookups,
coordinate matching) become vectorized binary searches — O(log N) VPU
compare/selects, no host round-trips, fully static shapes.

Coordinates are bounded to [-2048, 2047] per axis (at 0.01 m voxels this is
a +-20.5 m scene extent); out-of-range or masked-off voxels get the sentinel
key and sort to the back.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

COORD_OFFSET = 2048  # shifts coords into [0, 4096)
_K1_MAX = jnp.iinfo(jnp.int32).max


class CoordHash(NamedTuple):
    """Sorted coordinate table for one sparse level (per sample).

    Attributes:
        key1: (N,) int32 sorted primary key ((x+off)*4096 + (y+off)).
        key2: (N,) int32 secondary key (z+off), lexicographically sorted.
        perm: (N,) int32 index into the original coordinate array.
    """
    key1: jax.Array
    key2: jax.Array
    perm: jax.Array


def pack_keys(coords: jax.Array, mask: jax.Array):
    """(N, 3) int32 coords + (N,) mask -> two int32 lexicographic keys.

    Masked or out-of-range rows get (INT32_MAX, INT32_MAX) so they sort to
    the end and never match a real query.
    """
    shifted = coords + COORD_OFFSET
    in_range = jnp.all((shifted >= 0) & (shifted < 4096), axis=-1)
    valid = mask & in_range
    k1 = shifted[:, 0] * 4096 + shifted[:, 1]
    k2 = shifted[:, 2]
    k1 = jnp.where(valid, k1, _K1_MAX)
    k2 = jnp.where(valid, k2, _K1_MAX)
    return k1, k2, valid


def build_hash(coords: jax.Array, mask: jax.Array) -> CoordHash:
    """Sort coordinates into a queryable table. Duplicate coords allowed."""
    k1, k2, _ = pack_keys(coords, mask)
    idx = jnp.arange(coords.shape[0], dtype=jnp.int32)
    sk1, sk2, perm = jax.lax.sort((k1, k2, idx), num_keys=2)
    return CoordHash(sk1, sk2, perm)


def _lex_less(a1, a2, b1, b2):
    return (a1 < b1) | ((a1 == b1) & (a2 < b2))


def lookup(table: CoordHash, coords: jax.Array,
           mask: jax.Array | None = None) -> jax.Array:
    """Find each query coordinate in the table.

    Args:
        table: CoordHash over N stored coordinates.
        coords: (Q, 3) int32 queries.
        mask: optional (Q,) validity of queries.

    Returns:
        (Q,) int32 index into the *original* (pre-sort) coordinate array, or
        -1 where the coordinate is absent/invalid.
    """
    q = coords.shape[0]
    qmask = jnp.ones((q,), bool) if mask is None else mask
    q1, q2, qvalid = pack_keys(coords, qmask)
    n = table.key1.shape[0]
    lo = jnp.zeros((q,), jnp.int32)
    hi = jnp.full((q,), n, jnp.int32)
    # interval [lo, hi) halves each step; n.bit_length() steps shrink it to
    # a single slot from any n, +1 margin
    steps = max(1, n.bit_length() + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        m1 = table.key1[jnp.clip(mid, 0, n - 1)]
        m2 = table.key2[jnp.clip(mid, 0, n - 1)]
        less = _lex_less(m1, m2, q1, q2)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    pos = jnp.clip(lo, 0, n - 1)
    found = (table.key1[pos] == q1) & (table.key2[pos] == q2) & qvalid \
        & (q1 != _K1_MAX)
    return jnp.where(found, table.perm[pos], -1)


class UniqueResult(NamedTuple):
    """Deduplicated coordinates with static capacity.

    Attributes:
        coords: (capacity, 3) int32 unique coordinates (sorted key order),
            zero-filled past ``count``.
        mask: (capacity,) bool validity.
        inverse: (N,) int32 mapping each input row to its unique slot
            (-1 for masked inputs or rows dropped by capacity overflow).
        count: () int32 number of unique coordinates (pre-clamp).
    """
    coords: jax.Array
    mask: jax.Array
    inverse: jax.Array
    count: jax.Array


def unique_coords(coords: jax.Array, mask: jax.Array,
                  capacity: int) -> UniqueResult:
    """Deduplicate integer coordinates into a fixed-capacity table.

    Sort-based: ties are broken by original index, so the representative of
    each voxel is its first occurrence (deterministic analog of
    MinkowskiEngine's RANDOM_SUBSAMPLE collate). If there are more than
    ``capacity`` unique voxels the surplus (largest keys) is dropped.
    """
    n = coords.shape[0]
    k1, k2, valid = pack_keys(coords, mask)
    idx = jnp.arange(n, dtype=jnp.int32)
    sk1, sk2, perm = jax.lax.sort((k1, k2, idx), num_keys=2)
    is_new = jnp.concatenate([
        jnp.ones((1,), bool),
        (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])
    ])
    is_new = is_new & (sk1 != _K1_MAX)
    uslot = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # slot per sorted row
    count = jnp.sum(is_new.astype(jnp.int32))

    in_cap = is_new & (uslot < capacity)
    dump = capacity
    out_coords = jnp.zeros((capacity + 1, 3), jnp.int32)
    out_coords = out_coords.at[jnp.where(in_cap, uslot, dump)].add(
        jnp.where(in_cap[:, None], coords[perm], 0))
    out_mask = jnp.zeros((capacity + 1,), bool).at[
        jnp.where(in_cap, uslot, dump)].set(in_cap)

    inv_sorted = jnp.where((uslot < capacity) & (sk1 != _K1_MAX), uslot, -1)
    inverse = jnp.zeros((n,), jnp.int32).at[perm].set(inv_sorted)
    return UniqueResult(out_coords[:capacity], out_mask[:capacity], inverse,
                        count)
