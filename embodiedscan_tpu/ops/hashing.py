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
    """Find each query coordinate in a pre-built table (binary search).

    Prefer :func:`lookup_merge` on TPU: this variant issues O(log N) scalar
    gathers per query, which XLA lowers to slow element loops on TPU. It is
    kept for small/irregular lookups and as a reference implementation.
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


def pack_key32(coords: jax.Array, valid: jax.Array,
               origin: jax.Array) -> jax.Array:
    """Origin-relative coords -> one order-preserving int32 key.

    Layout: x (11 bits, 20.5 m at 0.01 m voxels) | y (11) | z (10, 10.2 m),
    assembled in uint32 and bias-flipped into int32 so unsigned order equals
    signed order. Invalid/out-of-range rows map to INT32_MAX.
    """
    rel = coords - origin
    in_range = (rel[:, 0] >= 0) & (rel[:, 0] < 2048) & \
        (rel[:, 1] >= 0) & (rel[:, 1] < 2048) & \
        (rel[:, 2] >= 0) & (rel[:, 2] < 1024)
    ok = valid & in_range
    r = rel.astype(jnp.uint32)
    key_u = (r[:, 0] << 21) | (r[:, 1] << 10) | r[:, 2]
    key_u = jnp.where(ok, key_u, jnp.uint32(0xFFFFFFFF))
    return (key_u ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def lookup_merge(coords: jax.Array, mask: jax.Array, queries: jax.Array,
                 qmask: jax.Array) -> jax.Array:
    """Batch coordinate lookup as a one-sort merge join (TPU fast path).

    TPU performance model (measured on v5e, 98k table x 2.65M queries):
    vectorized bitonic sorts cost ~6-10 ms nearly independent of size, while
    scalar gathers run at ~10 ns/element — so binary search (searchsorted)
    costs 17+ ms *per offset stream* and a full 27-offset neighbor lookup
    over 340 ms. This implementation uses exactly two sorts and two cummaxes
    for ALL queries at once (~19 ms total): concatenate table+query keys,
    sort (queries tie-break after their matching table key), propagate the
    last table key/row with ``lax.cummax`` (valid because table rows are
    key-ascending — the engine invariant), and un-permute with a second sort.

    Args:
        coords: (N, 3) stored coordinates (unique + key-sorted where mask,
            masked rows last — the SparseTensor engine invariant).
        mask: (N,) table validity.
        queries: (Q, 3) query coordinates (any order).
        qmask: (Q,) query validity.

    Returns:
        (Q,) int32 table row index or -1.
    """
    n = coords.shape[0]
    q = queries.shape[0]
    origin = jnp.min(jnp.where(mask[:, None], coords, jnp.int32(2**30)),
                     axis=0)
    kt = pack_key32(coords, mask, origin)
    kq = pack_key32(queries, qmask, origin)
    key = jnp.concatenate([kt, kq])
    # aux packs (is_table, row/qpos) into one operand: table rows in [0, n),
    # queries at n + qpos — also the correct tie-break (table first).
    aux = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int32),
        jnp.arange(n, n + q, dtype=jnp.int32)
    ])
    skey, saux = jax.lax.sort((key, aux), num_keys=2)
    is_table = saux < n
    # table rows are ascending with key (invariant), so the running max is
    # the row of the last table entry at-or-before this position; on TPU
    # the masked cummax pair runs as one Pallas scan pass (ops/pscan.py)
    from .pscan import join_scan
    (lkey, lrow), = join_scan(skey, saux, ((0, n),))
    ok = (~is_table) & (lrow >= 0) & (lkey == skey) & \
        (skey != jnp.iinfo(jnp.int32).max)
    res = jnp.where(ok, lrow, -1)
    # un-sort: queries carry unique positions; table rows go to the back
    unsort_key = jnp.where(is_table, n + q, saux - n)
    _, res_sorted = jax.lax.sort((unsort_key, res), num_keys=1)
    return res_sorted[:q]


def lookup_merge_multi(pairs) -> list:
    """Fuse several independent coordinate lookups into ONE sort.

    K independent lookups pay the sort cost 2K times (join sort + un-permute
    sort each). This fuses them into exactly two 2-operand sorts — measured
    on v5e, operand count dominates sort cost (a 3-operand stable sort is
    ~4x a 2-operand one), so the pair id is NOT a sort operand: all keys are
    sorted globally, and the cummax join runs per pair under a mask. That
    stays exact because within one pair the table rows ascend in both key
    and concat position (the engine invariant), so the masked lkey/lrow
    cummaxes always track the same winning entry; cross-pair key collisions
    are filtered by the same masks. Cost: 2 sorts + 2K cummaxes.

    Args:
        pairs: list of (coords, mask, queries, qmask) with the same
            contracts as :func:`lookup_merge`.

    Returns:
        list of (Q_i,) int32 arrays: table row index or -1, per pair.
    """
    int_min = jnp.iinfo(jnp.int32).min
    int_max = jnp.iinfo(jnp.int32).max
    keys = []
    tstarts, qstarts = [], []
    pos = 0
    # all tables first: with a stable sort, every table row lands before the
    # queries of equal key (the join's tie-break requirement)
    origins = []
    for coords, mask, _, _ in pairs:
        origin = jnp.min(
            jnp.where(mask[:, None], coords, jnp.int32(2**30)), axis=0)
        origins.append(origin)
        keys.append(pack_key32(coords, mask, origin))
        tstarts.append(pos)
        pos += coords.shape[0]
    n_tables = pos
    for i, (_, _, queries, qmask) in enumerate(pairs):
        keys.append(pack_key32(queries, qmask, origins[i]))
        qstarts.append(pos)
        pos += queries.shape[0]
    key = jnp.concatenate(keys)
    aux = jnp.arange(pos, dtype=jnp.int32)
    skey, saux = jax.lax.sort((key, aux), num_keys=1, is_stable=True)
    is_table = saux < n_tables
    bounds = tstarts[1:] + [n_tables]
    res = jnp.full((pos,), -1, jnp.int32)
    from .pscan import join_scan
    scans = join_scan(skey, saux, tuple(zip(tstarts, bounds)))
    for i in range(len(pairs)):
        lkey_i, lrow_i = scans[i]
        ok = (lrow_i >= 0) & (lkey_i == skey) & (skey != int_max)
        q_hi = pos if i == len(pairs) - 1 else qstarts[i + 1]
        mine = (~is_table) & (saux >= qstarts[i]) & (saux < q_hi)
        res = jnp.where(mine & ok, lrow_i - tstarts[i], res)
    # un-permute with one sort (saux is the original concat position)
    _, res_sorted = jax.lax.sort((saux, res), num_keys=1)
    out = []
    for i in range(len(pairs)):
        q = pairs[i][2].shape[0]
        out.append(res_sorted[qstarts[i]:qstarts[i] + q])
    return out


# ---------------------------------------------------------------------------
# Batched (flat) keys: batch id in the high bits of the SAME int32 key, so a
# whole batch's coordinate op is ONE flat sort over B*N rows instead of B
# sequential per-sample pipelines (VERDICT r2 #1). Because every sample
# contributes exactly N rows and its keys (valid AND sentinel) carry its
# batch bits, the sorted array splits into B static N-row segments — segment
# reductions become plain reshapes, never segment scans.
# ---------------------------------------------------------------------------


def key_layout(n_batch: int) -> tuple:
    """(bits_x, bits_y, bits_z) coordinate bit budget for a given batch size.

    The batch id takes ceil(log2(B)) high bits; the remaining bits are
    shaved from the per-axis extents in z, y, x order (z is indoor height —
    the axis with the least real extent). B=1 keeps the full (11, 11, 10)
    layout of :func:`pack_key32`. At 0.01 m stride-1 voxels the worst case
    shipped (B=4 -> 11, 10, 9) still spans 20.5 x 10.2 x 5.1 m from the
    scene's min corner; voxels beyond that are dropped (sentinel key), the
    same overflow behavior the B=1 layout has at 20.5 m.
    """
    bb = max(0, int(n_batch - 1).bit_length())
    assert bb <= 6, f'batch {n_batch} too large for a 32-bit packed key'
    bits = {'x': 11, 'y': 11, 'z': 10}
    for axis in ('z', 'y', 'x', 'z', 'y', 'x')[:bb]:
        bits[axis] -= 1
    return bits['x'], bits['y'], bits['z']


def batch_origin(coords: jax.Array, valid: jax.Array) -> jax.Array:
    """(B, 1, 3) per-sample min valid coordinate (the key origin)."""
    return jnp.min(
        jnp.where(valid[..., None], coords, jnp.int32(2**30)), axis=1,
        keepdims=True)


def pack_key32_b(coords: jax.Array, valid: jax.Array,
                 origin: jax.Array | None = None) -> jax.Array:
    """Batched order-preserving key: (B, N, 3) int32 coords -> (B, N) int32.

    ``origin`` is the (B, 1, 3) key origin — table and queries of one join
    MUST share it (the table's, as in :func:`lookup_merge`); it defaults to
    this array's own per-sample min. Invalid/out-of-range rows get the
    BATCH-LOCAL sentinel (batch bits | all-ones coords) so they sort to the
    end of their own sample's segment, keeping segments static.
    """
    b = coords.shape[0]
    bx, by, bz = key_layout(b)
    if origin is None:
        origin = batch_origin(coords, valid)
    rel = coords - origin
    in_range = (rel[..., 0] >= 0) & (rel[..., 0] < (1 << bx)) & \
        (rel[..., 1] >= 0) & (rel[..., 1] < (1 << by)) & \
        (rel[..., 2] >= 0) & (rel[..., 2] < (1 << bz))
    ok = valid & in_range
    r = rel.astype(jnp.uint32)
    coord_key = (r[..., 0] << (by + bz)) | (r[..., 1] << bz) | r[..., 2]
    sentinel = jnp.uint32((1 << (bx + by + bz)) - 1)
    coord_key = jnp.where(ok, coord_key, sentinel)
    bid = jnp.arange(b, dtype=jnp.uint32)[:, None] << (bx + by + bz)
    return ((coord_key | bid) ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def _sentinel_bits(n_batch: int) -> int:
    """Low coord-bit mask whose all-ones pattern marks a sentinel key."""
    bx, by, bz = key_layout(n_batch)
    return (1 << (bx + by + bz)) - 1


def _coord_sentinel_mask(key: jax.Array, n_batch: int) -> jax.Array:
    """True where a batched key is a (batch-local) sentinel."""
    mask = jnp.uint32(_sentinel_bits(n_batch))
    u = key.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    return (u & mask) == mask


def lookup_merge_b(coords: jax.Array, mask: jax.Array, queries: jax.Array,
                   qmask: jax.Array) -> jax.Array:
    """Batched :func:`lookup_merge`: (B, N, 3) tables x (B, Q, 3) queries
    -> (B, Q) row indices into each sample's own table, via ONE flat sort
    over B*(N+Q) rows. Exactness argument is the same cummax join: keys are
    unique per (batch, voxel) — batch bits prevent cross-sample matches —
    and table aux positions ascend with key globally (engine invariant
    within a sample; batch-major keys across samples).
    """
    b, n = coords.shape[:2]
    q = queries.shape[1]
    origin = batch_origin(coords, mask)
    kt = pack_key32_b(coords, mask, origin)
    kq = pack_key32_b(queries, qmask, origin)
    int_min = jnp.iinfo(jnp.int32).min
    key = jnp.concatenate([kt.reshape(-1), kq.reshape(-1)])
    aux = jnp.arange(b * (n + q), dtype=jnp.int32)
    skey, saux = jax.lax.sort((key, aux), num_keys=1, is_stable=True)
    is_table = saux < b * n
    # exclude sentinel table rows from the join (invalid queries could
    # otherwise "match" an invalid padding row of the same sample)
    from .pscan import join_scan
    (lkey, lrow), = join_scan(skey, saux, ((0, b * n),),
                              sentinel_bits=_sentinel_bits(b))
    ok = (~is_table) & (lrow >= 0) & (lkey == skey) & \
        ~_coord_sentinel_mask(skey, b)
    res = jnp.where(ok, lrow % n, -1)  # row within the sample's table
    unsort_key = jnp.where(is_table, b * (n + q), saux - b * n)
    _, res_sorted = jax.lax.sort((unsort_key, res), num_keys=1)
    return res_sorted[:b * q].reshape(b, q)


def lookup_merge_multi_b(pairs) -> list:
    """Batched :func:`lookup_merge_multi`: K independent batched lookups in
    exactly two flat sorts (one stable join sort + one un-permute sort).

    Args:
        pairs: list of (coords (B, Ni, 3), mask, queries (B, Qi, 3), qmask).

    Returns:
        list of (B, Qi) int32 row indices (into each sample's table) or -1.
    """
    int_min = jnp.iinfo(jnp.int32).min
    b = pairs[0][0].shape[0]
    keys, tstarts, qstarts, tns, origins = [], [], [], [], []
    pos = 0
    for coords, mask, _, _ in pairs:
        origin = batch_origin(coords, mask)
        origins.append(origin)
        keys.append(pack_key32_b(coords, mask, origin).reshape(-1))
        tstarts.append(pos)
        tns.append(coords.shape[1])
        pos += coords.shape[0] * coords.shape[1]
    n_tables = pos
    for i, (coords, mask, queries, qmask) in enumerate(pairs):
        keys.append(pack_key32_b(queries, qmask, origins[i]).reshape(-1))
        qstarts.append(pos)
        pos += queries.shape[0] * queries.shape[1]
    key = jnp.concatenate(keys)
    aux = jnp.arange(pos, dtype=jnp.int32)
    skey, saux = jax.lax.sort((key, aux), num_keys=1, is_stable=True)
    is_table = saux < n_tables
    not_sent = ~_coord_sentinel_mask(skey, b)
    bounds = tstarts[1:] + [n_tables]
    res = jnp.full((pos,), -1, jnp.int32)
    from .pscan import join_scan
    scans = join_scan(skey, saux, tuple(zip(tstarts, bounds)),
                      sentinel_bits=_sentinel_bits(b))
    for i in range(len(pairs)):
        lkey_i, lrow_i = scans[i]
        ok = (lrow_i >= 0) & (lkey_i == skey) & not_sent
        q_hi = pos if i == len(pairs) - 1 else qstarts[i + 1]
        mine = (~is_table) & (saux >= qstarts[i]) & (saux < q_hi)
        res = jnp.where(mine & ok, (lrow_i - tstarts[i]) % tns[i], res)
    _, res_sorted = jax.lax.sort((saux, res), num_keys=1)
    out = []
    for i, (_, _, queries, _) in enumerate(pairs):
        bq = queries.shape[0] * queries.shape[1]
        out.append(res_sorted[qstarts[i]:qstarts[i] + bq].reshape(
            queries.shape[0], queries.shape[1]))
    return out


class UniqueResult(NamedTuple):
    """Deduplicated coordinates with static capacity.

    Attributes:
        coords: (capacity, 3) int32 unique coordinates (sorted key order),
            zero-filled past ``count``.
        mask: (capacity,) bool validity.
        inverse: (N,) int32 mapping each input row to its unique slot
            (-1 for masked inputs or rows dropped by capacity overflow).
        count: () int32 number of unique coordinates (pre-clamp).
        rows: (capacity,) int32 original input row of each unique slot's
            representative (its FIRST occurrence); 0 past ``count``.
    """
    coords: jax.Array
    mask: jax.Array
    inverse: jax.Array
    count: jax.Array
    rows: jax.Array


def unique_coords(coords: jax.Array, mask: jax.Array,
                  capacity: int) -> UniqueResult:
    """Deduplicate integer coordinates into a fixed-capacity table.

    Sort-based and scatter-free: TPU scatters run element-by-element
    (~10-30 ns/element), so the compaction and the inverse map are built
    with two additional small 2-operand sorts instead (sorts stream at
    ~2 ms/M elements on v5e). Ties are broken by original index, so the
    representative of each voxel is its first occurrence (deterministic
    analog of MinkowskiEngine's RANDOM_SUBSAMPLE collate). If there are
    more than ``capacity`` unique voxels the surplus (largest keys) is
    dropped. Output order satisfies the engine invariant (key-sorted,
    padding last).
    """
    n = coords.shape[0]
    int_max = jnp.iinfo(jnp.int32).max
    origin = jnp.min(jnp.where(mask[:, None], coords, jnp.int32(2**30)),
                     axis=0)
    key = pack_key32(coords, mask, origin)
    idx = jnp.arange(n, dtype=jnp.int32)
    # idx as a second sort KEY: first-occurrence tie-break
    skey, perm = jax.lax.sort((key, idx), num_keys=2)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_new = is_new & (skey != int_max)
    uslot = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # slot per sorted row
    count = jnp.sum(is_new.astype(jnp.int32))

    # compaction sort: slot -> representative's original row
    in_cap = is_new & (uslot < capacity)
    ckey = jnp.where(in_cap, uslot, int_max)
    _, comp = jax.lax.sort((ckey, perm), num_keys=1)
    rows = comp[:capacity] if capacity <= n else jnp.concatenate(
        [comp, jnp.zeros((capacity - n,), jnp.int32)])
    out_mask = jnp.arange(capacity, dtype=jnp.int32) < count
    rows = jnp.where(out_mask, rows, 0)
    out_coords = jnp.where(out_mask[:, None], coords[rows], 0)

    # inverse map via un-permute sort (perm is a permutation of [0, n))
    inv_sorted = jnp.where((uslot < capacity) & (skey != int_max), uslot, -1)
    _, inverse = jax.lax.sort((perm, inv_sorted), num_keys=1)
    return UniqueResult(out_coords, out_mask, inverse, count, rows)


def unique_coords_b(coords: jax.Array, mask: jax.Array,
                    capacity: int) -> UniqueResult:
    """Batched :func:`unique_coords`: (B, N, 3) -> per-sample tables of
    ``capacity`` rows each, in THREE flat sorts over B*N rows total
    (the per-sample version costs 3 sorts per sample).

    Sentinel keys carry their sample's batch bits, so after the key sort
    every sample occupies a static N-row segment: the per-sample slot
    numbering is a reshaped cumsum, and the compaction sort's output
    segments are sliced, not searched. Semantics (first-occurrence
    representative, capacity overflow drops largest keys) match the
    per-sample op bit-for-bit; only the in-range extent differs (see
    :func:`key_layout`).

    Returns a batched UniqueResult: coords (B, cap, 3), mask (B, cap),
    inverse (B, N), count (B,), rows (B, cap) (rows index into the sample's
    own flattened N rows).
    """
    b, n = coords.shape[:2]
    key = pack_key32_b(coords, mask)  # (B, N), batch-local sentinels
    flat_key = key.reshape(-1)
    idx = jnp.arange(b * n, dtype=jnp.int32)
    # idx as a second sort KEY: first-occurrence tie-break (flat position
    # preserves within-sample order, and ties never cross samples)
    skey, perm = jax.lax.sort((flat_key, idx), num_keys=2)
    sk2 = skey.reshape(b, n)
    is_new = jnp.concatenate(
        [jnp.ones((b, 1), bool), sk2[:, 1:] != sk2[:, :-1]], axis=1)
    is_new = is_new & ~_coord_sentinel_mask(sk2, b)
    uslot = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1  # per-sample
    count = jnp.sum(is_new.astype(jnp.int32), axis=1)

    # compaction: per-sample slot -> representative's original row, via ONE
    # flat sort whose key packs (batch, slot): every sample gets exactly
    # n + 1 slots of key space (slot `n` collects its non-representative
    # rows), so each sample's survivors land in a STATIC n-row segment.
    in_cap = is_new & (uslot < capacity)
    ckey = jnp.where(in_cap, uslot, n)
    ckey = ckey + (jnp.arange(b, dtype=jnp.int32) * (n + 1))[:, None]
    _, comp = jax.lax.sort((ckey.reshape(-1), perm), num_keys=1)
    comp = comp.reshape(b, n)
    if capacity <= n:
        rows = comp[:, :capacity]
    else:
        rows = jnp.concatenate(
            [comp, jnp.zeros((b, capacity - n), jnp.int32)], axis=1)
    out_mask = jnp.arange(capacity, dtype=jnp.int32)[None] < count[:, None]
    rows = jnp.where(out_mask, rows - jnp.arange(
        b, dtype=jnp.int32)[:, None] * n, 0)  # flat row -> within-sample row
    out_coords = jnp.where(
        out_mask[..., None],
        jnp.take_along_axis(coords, rows[..., None].astype(jnp.int32),
                            axis=1), 0)

    # inverse map: un-permute with one flat sort (perm is a permutation)
    valid_new = (uslot < capacity) & ~_coord_sentinel_mask(sk2, b)
    inv_sorted = jnp.where(valid_new, uslot, -1)
    _, inverse = jax.lax.sort((perm, inv_sorted.reshape(-1)), num_keys=1)
    return UniqueResult(out_coords, out_mask, inverse.reshape(b, n), count,
                        rows)
