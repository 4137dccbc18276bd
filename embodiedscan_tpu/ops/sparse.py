"""Fixed-capacity sparse voxel engine (TPU-native MinkowskiEngine equivalent).

The reference leans on MinkowskiEngine (C++/CUDA) for sparse 3D convolution
(``mink_resnet.py:58-69``, ``fcaf3d_head.py:104-170``, SURVEY.md §2b). This
module rebuilds those semantics TPU-first:

- A level is ``SparseTensor(coords, feats, mask)`` with a *static* capacity:
  coords are int32 lattice points in units of the level's stride, masked rows
  are padding. Everything jits, vmaps over the batch, and shards over a mesh.
- Convolutions are "gather + matmul": a sorted-hash neighbor table (built once
  per level per forward, see ``hashing.py``) turns each kernel offset into one
  feature gather plus one (N, Cin) x (Cin, Cout) MXU matmul.
- Pooling/striding reuse the dedup inverse mapping (segment ops, no hashing).
- The generative transposed conv (kernel 2, stride 2) emits exactly the 8
  children of each parent: a single (N, Cin) x (Cin, 8*Cout) matmul.

All functions are per-sample and parameter-free; norm layers and weights live
in the flax model layer.
"""

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import lookup_merge, unique_coords

# Kernel offset tables. Order is fixed (x-major) and is part of this
# framework's weight layout contract.
OFFSETS_3 = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)], dtype=np.int32)  # (27, 3)
OFFSETS_2 = np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=np.int32)  # (8, 3)
OFFSETS_1 = np.zeros((1, 3), dtype=np.int32)

# Trace-time compute dtype for sparse-conv gathers+matmuls. None keeps the
# input dtype (f32); jnp.bfloat16 halves gather bandwidth and runs the MXU
# native (accumulation stays f32). Set via set_conv_compute_dtype() BEFORE
# tracing/jit; it is baked into compiled programs, not a runtime switch.
CONV_COMPUTE_DTYPE = None


def set_conv_compute_dtype(dtype) -> None:
    """Set the sparse-conv compute dtype (None or jnp.bfloat16)."""
    global CONV_COMPUTE_DTYPE
    CONV_COMPUTE_DTYPE = dtype


# 'flat' (default) packs the batch id into the coordinate sort key and runs
# every sort-carrying op as ONE flat sort over B*N rows (hashing.py batched
# primitives): batch-size-independent HLO, no serialization, near-linear b
# scaling. 'unroll' emits one flat per-sample pipeline per batch element
# (the pre-flat default; B copies of the HLO); 'scan' emits ONE traced copy
# rolled into a lax.map loop (batch-independent HLO but the per-sample
# pipelines serialize); 'vmap' emits a single batched program (sorts carry
# a batch dim: ~12x slower on TPU, fastest to compile).
BMAP_MODE = os.environ.get('EMBODIEDSCAN_BMAP', 'flat')


def set_bmap_mode(mode: str) -> None:
    """Set the bmap strategy ('flat'/'unroll'/'scan'/'vmap') BEFORE jit."""
    assert mode in ('flat', 'unroll', 'scan', 'vmap'), mode
    global BMAP_MODE
    BMAP_MODE = mode


def bmap(fn, in_axes):
    """Map ``fn`` over a leading batch axis by UNROLLING, not ``vmap``.

    TPU ``lax.sort`` degrades ~12x when given a leading batch dimension
    (measured on v5e: 2.6 ms flat vs 31 ms as (1, T) at 1.87M elements), so
    every sort-carrying coordinate op must run on flat per-sample arrays.
    ``in_axes`` follows vmap semantics (0 or None per positional arg).
    See ``BMAP_MODE`` for the 'scan' (one rolled traced copy) and 'vmap'
    alternatives.
    """
    def wrapped(*args):
        if BMAP_MODE == 'vmap' or BMAP_MODE == 'flat':
            # under 'flat', generic (sort-free) per-sample fns vmap cleanly;
            # the sort-carrying ops dispatch to hashing.py *_b primitives at
            # their call sites instead of coming through bmap
            return jax.vmap(fn, in_axes=in_axes)(*args)
        b = next(
            jax.tree_util.tree_leaves(a)[0].shape[0]
            for a, ax in zip(args, in_axes) if ax == 0)
        if BMAP_MODE == 'scan' and b > 1:
            mapped = [a for a, ax in zip(args, in_axes) if ax == 0]
            closed = [(a, ax) for a, ax in zip(args, in_axes)]

            def body(sliced):
                it = iter(sliced)
                return fn(*[next(it) if ax == 0 else a for a, ax in closed])

            return jax.lax.map(body, tuple(mapped))
        outs = [
            fn(*[a if ax is None else
                 jax.tree_util.tree_map(lambda x: x[i], a)
                 for a, ax in zip(args, in_axes)]) for i in range(b)
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    return wrapped


class SparseTensor(NamedTuple):
    """One sparse level for one sample.

    Engine invariant: valid coords are unique and sorted by their packed
    lexicographic (x, y, z) key — every constructor in this module preserves
    it, and ``lookup_merge``'s cummax-join relies on it.

    Attributes:
        coords: (N, 3) int32 lattice coordinates (units of the level stride).
        feats: (N, C) features; rows with ``mask == False`` are padding and
            must be treated as zero.
        mask: (N,) bool validity.
    """
    coords: jax.Array
    feats: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


def from_points(points_xyz: jax.Array, feats: jax.Array, mask: jax.Array,
                voxel_size: float, capacity: int) -> SparseTensor:
    """Voxelize points into a stride-1 sparse tensor.

    Matches ``ME.utils.batch_sparse_collate([(p[:, :3] / voxel_size, f)])``
    + SparseTensor quantization (sparse_featfusion_single_stage.py:110-118):
    coordinates are floor(p / voxel_size); duplicate voxels keep the first
    point's features (deterministic stand-in for ME's RANDOM_SUBSAMPLE).
    """
    coords = jnp.floor(points_xyz / voxel_size).astype(jnp.int32)
    uniq = unique_coords(coords, mask, capacity)
    # representative = first occurrence (uniq.rows, no scatter needed)
    out_feats = jnp.where(uniq.mask[:, None], feats[uniq.rows], 0)
    return SparseTensor(uniq.coords, out_feats, uniq.mask)


def from_points_b(points_xyz: jax.Array, feats: jax.Array, mask: jax.Array,
                  voxel_size: float, capacity: int) -> SparseTensor:
    """Batched :func:`from_points`: (B, N, ...) in, batched SparseTensor out.

    One flat dedup over B*N rows (batch id in the sort key) instead of B
    sequential per-sample pipelines — see hashing.unique_coords_b.
    """
    from .hashing import unique_coords_b
    coords = jnp.floor(points_xyz / voxel_size).astype(jnp.int32)
    uniq = unique_coords_b(coords, mask, capacity)
    gathered = jnp.take_along_axis(feats, uniq.rows[..., None], axis=1)
    out_feats = jnp.where(uniq.mask[..., None], gathered, 0)
    return SparseTensor(uniq.coords, out_feats, uniq.mask)


def _center_offset(offsets: np.ndarray):
    """Index of the (0,0,0) offset, or None; its table column is identity."""
    center = np.where((np.asarray(offsets) == 0).all(1))[0]
    return int(center[0]) if len(center) == 1 and offsets.shape[0] > 1 \
        else None


def neighbor_table_b(st: SparseTensor, offsets: np.ndarray) -> jax.Array:
    """Batched :func:`neighbor_table`: (B, N, K) via one flat join sort."""
    from .hashing import lookup_merge_b
    b, n = st.coords.shape[:2]
    offsets = np.asarray(offsets)
    c = _center_offset(offsets)
    if c is not None:
        # a valid voxel always contains itself: skip the center queries
        # (1/27 of the join + un-permute sort rows)
        offsets = np.delete(offsets, c, axis=0)
    k = offsets.shape[0]
    queries = (st.coords[:, :, None, :] +
               jnp.asarray(offsets)[None, None]).reshape(b, n * k, 3)
    qmask = jnp.repeat(st.mask, k, axis=1)
    idx = lookup_merge_b(st.coords, st.mask, queries,
                         qmask).reshape(b, n, k)
    if c is not None:
        ident = jnp.where(st.mask, jnp.arange(n, dtype=jnp.int32)[None], -1)
        idx = jnp.concatenate([idx[..., :c], ident[..., None], idx[..., c:]],
                              axis=-1)
    return idx


def downsample_coords_b(st: SparseTensor, capacity: int) -> 'DownsampleMap':
    """Batched :func:`downsample_coords` (one flat dedup)."""
    from .hashing import unique_coords_b
    coarse = jnp.floor_divide(st.coords, 2)
    uniq = unique_coords_b(coarse, st.mask, capacity)
    return DownsampleMap(uniq.coords, uniq.mask, uniq.inverse)


def _monotone_desc_key(scores: jax.Array) -> jax.Array:
    """float32 scores -> uint32 keys whose ASCENDING order is score-descending.

    Standard sign-flip trick: for non-negative floats the IEEE bit pattern
    is order-preserving; negatives order reversed. Map to ascending uint
    then bit-invert for descending.
    """
    u = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.uint32)
    asc = jnp.where(u >> 31 == 0, u | jnp.uint32(0x80000000), ~u)
    return ~asc


def topk_rows_b(scores: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Per-sample top-k row indices over (B, N) scores via ONE flat sort.

    The sort key packs the batch id in the high bits and the
    (monotone-mapped, low-bits-truncated) score below — each sample's rows
    form a static N-row segment, so "top k per sample" is a reshape+slice.
    Truncating ceil(log2(B)) low score bits only coarsens tie-breaking among
    near-equal scores (B=1 is exact). Returns (B, k) within-sample row
    indices in score-descending order. This is the flat-engine replacement
    for ``lax.top_k`` under vmap (a batched sort, PERF.md hardware table).
    """
    b, n = scores.shape
    bb = max(0, int(b - 1).bit_length())
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask, scores, neg)
    skey = _monotone_desc_key(masked) >> bb
    skey = skey | (jnp.arange(b, dtype=jnp.uint32)[:, None] << (32 - bb)) \
        if bb else skey
    skey = (skey ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    idx = jnp.arange(b * n, dtype=jnp.int32)
    _, sidx = jax.lax.sort((skey.reshape(-1), idx), num_keys=2)
    return sidx.reshape(b, n)[:, :k] - (
        jnp.arange(b, dtype=jnp.int32) * n)[:, None]


def topk_select_b(st: SparseTensor, scores: jax.Array,
                  k: int) -> SparseTensor:
    """Batched :func:`topk_select`: per-sample top-k in two flat sorts
    (see :func:`topk_rows_b`); the coordinate re-sort restoring the engine
    invariant runs as one flat B*k sort."""
    from .hashing import key_layout, pack_key32_b
    b, n = scores.shape
    sel = topk_rows_b(scores, st.mask, k)  # within-sample rows
    sel_coords = jnp.take_along_axis(st.coords, sel[..., None], axis=1)
    keep_mask = jnp.take_along_axis(st.mask, sel, axis=1)
    # restore the key-sorted engine invariant (selection is score-ordered)
    ck = pack_key32_b(sel_coords, keep_mask)
    pos = jnp.arange(b * k, dtype=jnp.int32)
    _, perm = jax.lax.sort((ck.reshape(-1), pos), num_keys=2)
    perm = perm.reshape(b, k) - (jnp.arange(b, dtype=jnp.int32) * k)[:, None]
    sel = jnp.take_along_axis(sel, perm, axis=1)
    keep_mask = jnp.take_along_axis(st.mask, sel, axis=1)
    coords = jnp.take_along_axis(st.coords, sel[..., None], axis=1)
    feats = jnp.take_along_axis(st.feats, sel[..., None], axis=1)
    return SparseTensor(coords, jnp.where(keep_mask[..., None], feats, 0),
                        keep_mask)


def btopk_select(st: SparseTensor, scores: jax.Array, k: int) -> SparseTensor:
    """Batched top-k dispatcher: flat-key path or per-sample bmap."""
    if BMAP_MODE == 'flat':
        return topk_select_b(st, scores, k)
    return bmap(topk_select, (0, 0, None))(st, scores, k)


def neighbor_table(st: SparseTensor, offsets: np.ndarray) -> jax.Array:
    """(N, K) neighbor indices for submanifold kernels (-1 where absent).

    All offsets go through ONE merge-join call: sort calls have a large
    fixed cost on TPU, so a single 28N-element sort beats 27 searchsorted
    streams by ~20x (see lookup_merge).
    """
    offsets = np.asarray(offsets)
    c = _center_offset(offsets)
    if c is not None:  # identity column: a valid voxel contains itself
        offsets = np.delete(offsets, c, axis=0)
    k = offsets.shape[0]
    queries = (st.coords[:, None, :] + jnp.asarray(offsets)[None, :, :])
    flat = queries.reshape(-1, 3)
    qmask = jnp.repeat(st.mask, k)
    idx = lookup_merge(st.coords, st.mask, flat, qmask).reshape(
        st.capacity, k)
    if c is not None:
        ident = jnp.where(st.mask,
                          jnp.arange(st.capacity, dtype=jnp.int32), -1)
        idx = jnp.concatenate([idx[:, :c], ident[:, None], idx[:, c:]],
                              axis=1)
    return idx


def gather_matmul_conv(feats: jax.Array, mask: jax.Array, nbr: jax.Array,
                       weights: jax.Array, bias: jax.Array | None = None
                       ) -> jax.Array:
    """Sparse convolution core: sum_k gather(feats, nbr[:, k]) @ W[k].

    Args:
        feats: (N, Cin) input features.
        mask: (N,) input validity.
        nbr: (M, K) gather indices into feats (-1 = absent neighbor).
        weights: (K, Cin, Cout).
        bias: optional (Cout,).

    Returns:
        (M, Cout) output features (caller masks with the output mask).
    """
    n, cin = feats.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    safe_feats = jnp.where(mask[:, None], feats, 0)
    if CONV_COMPUTE_DTYPE is not None:
        # cast BEFORE the gather: row gathers are HBM-bandwidth-bound on TPU,
        # so bf16 halves the dominant cost; accumulation stays f32 via
        # preferred_element_type
        safe_feats = safe_feats.astype(CONV_COMPUTE_DTYPE)
        weights = weights.astype(CONV_COMPUTE_DTYPE)
    padded = jnp.concatenate(
        [safe_feats, jnp.zeros((1, cin), safe_feats.dtype)])
    idx = jnp.where(nbr >= 0, nbr, n)  # absent -> zero row
    # One row-gather + (M, Cin) x (Cin, Cout) MXU matmul per kernel offset.
    # Measured on TPU v5e: this unrolled form compiles ~100x faster and runs
    # faster than a single fused (M, K*Cin) x (K*Cin, Cout) contraction.
    out = jnp.zeros((nbr.shape[0], cout), jnp.float32)
    for j in range(k):
        out = out + jnp.dot(padded[idx[:, j]], weights[j],
                            preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


@jax.custom_vjp
def subm_gather_conv(feats: jax.Array, mask: jax.Array, nbr: jax.Array,
                     weights: jax.Array) -> jax.Array:
    """Submanifold conv core with a gather-only backward.

    Same forward as :func:`gather_matmul_conv` restricted to the
    submanifold case (in/out share coords, so ``nbr`` is (N, K) with K
    mirror-symmetric offsets). XLA's autodiff of a gather is a scatter-add,
    which runs element-by-element on TPU; here the cotangent w.r.t.
    ``feats`` is computed as ANOTHER gather conv with the mirrored table
    (``nbr[:, ::-1]``-equivalent: who gathers row j at offset k is exactly
    row ``nbr[j, K-1-k]``), keeping the backward in the fast gather+MXU
    regime.
    """
    return gather_matmul_conv(feats, mask, nbr, weights)


def _subm_fwd(feats, mask, nbr, weights):
    return subm_gather_conv(feats, mask, nbr, weights), (feats, mask, nbr,
                                                         weights)


def _subm_bwd(res, dout):
    feats, mask, nbr, weights = res
    k = weights.shape[0]
    n, cin = feats.shape
    cout = weights.shape[-1]
    # ONE gather of dout per offset serves BOTH cotangents: the subm mirror
    # identity (nbr[i,k] = m  <=>  nbr[m, K-1-k] = i) turns the weight
    # gradient into dW[K-1-j] = feats^T @ dout[nbr[:, j]] — the same
    # gathered arrays the dfeats term needs. 27 gathers per conv backward
    # instead of 54; gathers are the row-count-bound cost of the engine.
    safe_feats = jnp.where(mask[:, None], feats, 0)
    safe_dout = jnp.where(mask[:, None], dout, 0)
    w = weights
    if CONV_COMPUTE_DTYPE is not None:
        safe_feats = safe_feats.astype(CONV_COMPUTE_DTYPE)
        safe_dout = safe_dout.astype(CONV_COMPUTE_DTYPE)
        w = w.astype(CONV_COMPUTE_DTYPE)
    padded = jnp.concatenate(
        [safe_dout, jnp.zeros((1, cout), safe_dout.dtype)])
    idx = jnp.where(nbr >= 0, nbr, n)
    dfeats = jnp.zeros((n, cin), jnp.float32)
    dws = [None] * k
    for j in range(k):
        g = padded[idx[:, j]]  # dout[nbr[:, j]], absent -> zero row
        dfeats = dfeats + jnp.dot(g, w[k - 1 - j].T,
                                  preferred_element_type=jnp.float32)
        dws[k - 1 - j] = jax.lax.dot_general(
            safe_feats, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dfeats = jnp.where(mask[:, None], dfeats, 0).astype(feats.dtype)
    dw = jnp.stack(dws).astype(weights.dtype)
    return dfeats, None, None, dw


subm_gather_conv.defvjp(_subm_fwd, _subm_bwd)


@jax.custom_vjp
def strided_gather_conv(feats: jax.Array, mask: jax.Array, nbr: jax.Array,
                        t_nbr: jax.Array, weights: jax.Array) -> jax.Array:
    """Strided conv core with a gather-only backward.

    Forward: ``sum_k feats[nbr[:, k]] @ W[k]`` over coarse outputs (same as
    :func:`gather_matmul_conv`). ``t_nbr`` is the TRANSPOSE table, (N_in, K)
    int32: ``t_nbr[j, k]`` is the coarse output row that gathers fine row
    ``j`` at offset ``k`` (i.e. the row of ``(coords_in[j] - off_k) / 2``
    when divisible, else -1). The cotangent w.r.t. ``feats`` then becomes a
    gather conv over ``t_nbr`` with transposed weights — XLA's default
    scatter-add backward runs element-by-element on TPU.
    """
    del t_nbr
    return gather_matmul_conv(feats, mask, nbr, weights)


def _strided_fwd(feats, mask, nbr, t_nbr, weights):
    return (gather_matmul_conv(feats, mask, nbr, weights),
            (feats, mask, nbr, t_nbr, weights))


def _strided_bwd(res, dout):
    feats, mask, nbr, t_nbr, weights = res
    k = weights.shape[0]
    m = dout.shape[0]
    n, cin = feats.shape
    cout = weights.shape[-1]
    # Same single-gather fusion as _subm_bwd, via the transpose table:
    # t_nbr[j, k] = m <=> nbr[m, k] = j, so
    #   dW[k] = feats^T @ dout[t_nbr[:, k]]
    # reuses the per-offset dout gathers of the dfeats term (K gathers per
    # backward instead of 2K).
    safe_feats = jnp.where(mask[:, None], feats, 0)
    w = weights
    dout_c = dout
    if CONV_COMPUTE_DTYPE is not None:
        safe_feats = safe_feats.astype(CONV_COMPUTE_DTYPE)
        dout_c = dout_c.astype(CONV_COMPUTE_DTYPE)
        w = w.astype(CONV_COMPUTE_DTYPE)
    padded = jnp.concatenate([dout_c, jnp.zeros((1, cout), dout_c.dtype)])
    t_idx = jnp.where(t_nbr >= 0, t_nbr, m)
    dfeats = jnp.zeros((n, cin), jnp.float32)
    dws = [None] * k
    for j in range(k):
        g = padded[t_idx[:, j]]  # dout[t_nbr[:, j]], absent -> zero row
        dfeats = dfeats + jnp.dot(g, w[j].T,
                                  preferred_element_type=jnp.float32)
        dws[j] = jax.lax.dot_general(
            safe_feats, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dfeats = jnp.where(mask[:, None], dfeats, 0).astype(feats.dtype)
    dw = jnp.stack(dws).astype(weights.dtype)
    return dfeats, None, None, None, dw


strided_gather_conv.defvjp(_strided_fwd, _strided_bwd)


def subm_conv(st: SparseTensor, weights: jax.Array,
              bias: jax.Array | None = None,
              nbr: jax.Array | None = None) -> SparseTensor:
    """Submanifold conv (kernel 3, stride 1): coords unchanged.

    ``nbr`` may be precomputed (and shared across convs on the same level).
    """
    if nbr is None:
        nbr = neighbor_table(st, OFFSETS_3)
    out = gather_matmul_conv(st.feats, st.mask, nbr, weights, bias)
    out = jnp.where(st.mask[:, None], out, 0)
    return SparseTensor(st.coords, out.astype(st.feats.dtype), st.mask)


class DownsampleMap(NamedTuple):
    """Coordinate bookkeeping for a stride-2 reduction.

    Attributes:
        coords: (M, 3) coarse coordinates (units of the coarse stride).
        mask: (M,) coarse validity.
        inverse: (N,) fine row -> coarse slot (-1 for padding/overflow).
    """
    coords: jax.Array
    mask: jax.Array
    inverse: jax.Array


def downsample_coords(st: SparseTensor, capacity: int) -> DownsampleMap:
    """Coarse coordinates = unique(floor(fine / 2)) (ME stride-2 striding)."""
    coarse = jnp.floor_divide(st.coords, 2)
    uniq = unique_coords(coarse, st.mask, capacity)
    return DownsampleMap(uniq.coords, uniq.mask, uniq.inverse)


def strided_conv(st: SparseTensor, dmap: DownsampleMap, weights: jax.Array,
                 bias: jax.Array | None = None) -> SparseTensor:
    """Conv kernel 3, stride 2 (ME semantics, mink_resnet.py:58-62,104-110).

    Output coords live on the coarse lattice; each output gathers fine voxels
    at ``2*o + k`` for k in the centered 3x3x3 region.
    """
    kofs = jnp.asarray(OFFSETS_3)
    queries = (dmap.coords[:, None, :] * 2 + kofs[None, :, :]).reshape(-1, 3)
    qmask = jnp.repeat(dmap.mask, kofs.shape[0])
    nbr = lookup_merge(st.coords, st.mask, queries,
                       qmask).reshape(dmap.coords.shape[0], -1)
    out = gather_matmul_conv(st.feats, st.mask, nbr, weights, bias)
    out = jnp.where(dmap.mask[:, None], out, 0)
    return SparseTensor(dmap.coords, out.astype(st.feats.dtype), dmap.mask)


def center_child_index(st: SparseTensor, dmap: DownsampleMap) -> jax.Array:
    """(M, 1) index of each parent's (0,0,0)-child, via the dedup inverse.

    The input row at exactly ``2*o`` is the one whose coords are all even and
    whose dedup inverse is ``o`` — no sort/lookup needed (sorts are the
    dominant cost of coordinate ops on TPU).
    """
    m = dmap.coords.shape[0]
    zero_child = st.mask & jnp.all(st.coords % 2 == 0, axis=-1) & \
        (dmap.inverse >= 0)
    slot = jnp.where(zero_child, dmap.inverse, m)
    nbr = jnp.full((m + 1,), -1, jnp.int32).at[slot].set(
        jnp.arange(st.capacity, dtype=jnp.int32))[:m]
    return nbr[:, None]


def conv1x1_strided(st: SparseTensor, dmap: DownsampleMap, weights: jax.Array,
                    bias: jax.Array | None = None) -> SparseTensor:
    """Kernel-1 stride-2 conv (ResNet downsample branch): gather at 2*o."""
    nbr = center_child_index(st, dmap)
    out = gather_matmul_conv(st.feats, st.mask, nbr, weights[None] if
                             weights.ndim == 2 else weights, bias)
    out = jnp.where(dmap.mask[:, None], out, 0)
    return SparseTensor(dmap.coords, out.astype(st.feats.dtype), dmap.mask)


def maxpool2(st: SparseTensor, dmap: DownsampleMap) -> SparseTensor:
    """Max pool kernel 2 stride 2: segment-max of children via the inverse map."""
    m = dmap.coords.shape[0]
    slot = jnp.where((dmap.inverse >= 0) & st.mask, dmap.inverse, m)
    neg = jnp.finfo(st.feats.dtype).min
    init = jnp.full((m + 1, st.feats.shape[1]), neg, st.feats.dtype)
    pooled = init.at[slot].max(jnp.where(st.mask[:, None], st.feats, neg))
    pooled = pooled[:m]
    pooled = jnp.where(dmap.mask[:, None], pooled, 0)
    pooled = jnp.where(pooled == neg, 0, pooled)
    return SparseTensor(dmap.coords, pooled, dmap.mask)


def generative_transpose2(st: SparseTensor, weights: jax.Array,
                          bias: jax.Array | None = None
                          ) -> Tuple[SparseTensor, jax.Array]:
    """Generative transposed conv kernel 2 stride 2 (fcaf3d_head.py:115-135).

    Every parent emits its 8 children ``2*c + off``; children of distinct
    parents are distinct, so no dedup is needed. Output capacity is 8x the
    input capacity; slot of child ``(p, off)`` is ``p * 8 + code(off)``.

    Args:
        weights: (8, Cin, Cout), one matrix per child offset.

    Returns:
        (child SparseTensor, parent_index (8N,) mapping child slot -> parent).
    """
    n, cin = st.feats.shape
    cout = weights.shape[-1]
    safe = jnp.where(st.mask[:, None], st.feats, 0)
    # (N, Cin) @ (Cin, 8*Cout): one MXU matmul for all children
    big = jax.lax.dot_general(
        safe, jnp.transpose(weights, (1, 0, 2)).reshape(cin, 8 * cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    child_feats = big.reshape(n, 8, cout).reshape(n * 8, cout)
    offs = jnp.asarray(OFFSETS_2)  # (8, 3)
    child_coords = (st.coords[:, None, :] * 2 + offs[None, :, :]).reshape(-1, 3)
    child_mask = jnp.repeat(st.mask, 8)
    if bias is not None:
        child_feats = child_feats + bias
    child_feats = jnp.where(child_mask[:, None], child_feats, 0)
    parent_index = jnp.repeat(jnp.arange(n, dtype=jnp.int32), 8)
    return (SparseTensor(child_coords, child_feats.astype(st.feats.dtype),
                         child_mask), parent_index)


def scatter_sum_into(dst: SparseTensor, src: SparseTensor,
                     idx: jax.Array | None = None) -> SparseTensor:
    """Add ``src`` features into ``dst`` rows with matching coordinates.

    Used by the FPN lateral sum (``x = inputs[i] + up_block(x)``,
    fcaf3d_head.py:1010-1013). Source voxels with no matching destination
    coordinate are dropped (in the FPN they cannot occur: backbone coords are
    always children of the coarser level's coords). ``idx`` may carry the
    precomputed ``lookup_merge(dst, src.coords)`` result (sort fusion).
    """
    if idx is None:
        idx = lookup_merge(dst.coords, dst.mask, src.coords, src.mask)
    slot = jnp.where(idx >= 0, idx, dst.capacity)
    add = jnp.where((idx >= 0)[:, None] & src.mask[:, None], src.feats, 0)
    feats = jnp.concatenate(
        [dst.feats, jnp.zeros((1, dst.feats.shape[1]), dst.feats.dtype)])
    feats = feats.at[slot].add(add)[:dst.capacity]
    return SparseTensor(dst.coords, feats, dst.mask)


def topk_select(st: SparseTensor, scores: jax.Array,
                k: int) -> SparseTensor:
    """Keep the top-k voxels by score (masked rows score -inf).

    Static-shape analog of ``FCAF3DHead._prune`` (fcaf3d_head.py:277-299):
    the reference keeps ``min(len, pts_prune_threshold)`` voxels per sample;
    here k is the static output capacity.
    """
    from .hashing import pack_keys
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(st.mask, scores, neg)
    _, idx = jax.lax.top_k(masked, k)
    keep_mask = st.mask[idx]
    # restore the key-sorted engine invariant (top_k orders by score)
    k1, k2, _ = pack_keys(st.coords[idx], keep_mask)
    _, _, perm = jax.lax.sort(
        (k1, k2, jnp.arange(k, dtype=jnp.int32)), num_keys=2)
    idx = idx[perm]
    keep_mask = st.mask[idx]
    return SparseTensor(st.coords[idx],
                        jnp.where(keep_mask[:, None], st.feats[idx], 0),
                        keep_mask)


def to_dense(st: SparseTensor, origin: jax.Array,
             grid_shape: Tuple[int, int, int]) -> jax.Array:
    """Scatter a sparse tensor into a dense (X, Y, Z, C) volume.

    Equivalent of ME ``.dense()`` (embodied_occ.py:233-243). ``origin`` is the
    lattice coordinate of voxel (0, 0, 0) in the dense grid.
    """
    gx, gy, gz = grid_shape
    rel = st.coords - origin
    inb = st.mask & jnp.all((rel >= 0), axis=-1) & (rel[:, 0] < gx) \
        & (rel[:, 1] < gy) & (rel[:, 2] < gz)
    flat_idx = (rel[:, 0] * gy + rel[:, 1]) * gz + rel[:, 2]
    flat_idx = jnp.where(inb, flat_idx, gx * gy * gz)
    c = st.feats.shape[1]
    vol = jnp.zeros((gx * gy * gz + 1, c), st.feats.dtype)
    vol = vol.at[flat_idx].add(jnp.where(inb[:, None], st.feats, 0))
    return vol[:-1].reshape(gx, gy, gz, c)


def interp_queries(query_xyz: jax.Array) -> jax.Array:
    """(Q, 8, 3) integer corner coordinates for trilinear interpolation."""
    base = jnp.floor(query_xyz).astype(jnp.int32)
    return base[:, None, :] + jnp.asarray(OFFSETS_2)[None]


def interpolate_trilinear(st: SparseTensor, query_xyz: jax.Array,
                          query_mask: jax.Array,
                          idx: jax.Array | None = None) -> jax.Array:
    """Trilinear interpolation of sparse features at float lattice coords.

    Equivalent of ME ``features_at_coordinates`` used by FPN pruning
    (fcaf3d_head.py:287-292). Absent neighbors contribute zero. ``idx`` may
    carry the precomputed (Q, 8) corner lookup (``interp_queries`` result
    against ``st`` — sort fusion).
    """
    base = jnp.floor(query_xyz).astype(jnp.int32)
    frac = query_xyz - base
    n = st.capacity
    nq = query_xyz.shape[0]
    safe = jnp.where(st.mask[:, None], st.feats, 0)
    padded = jnp.concatenate([safe, jnp.zeros((1, st.feats.shape[1]),
                                              st.feats.dtype)])
    offs = jnp.asarray(OFFSETS_2)  # (8, 3)
    if idx is None:
        q8 = (base[:, None, :] + offs[None]).reshape(-1, 3)
        idx = lookup_merge(st.coords, st.mask, q8,
                           jnp.repeat(query_mask, 8)).reshape(nq, 8)
    w = jnp.prod(jnp.where(offs[None] == 1, frac[:, None, :],
                           1 - frac[:, None, :]), axis=-1)  # (nq, 8)
    gathered = padded[jnp.where(idx >= 0, idx, n)]  # (nq, 8, C)
    out = jnp.sum(gathered * w[..., None], axis=1)
    return jnp.where(query_mask[:, None], out, 0)


def interpolate_trilinear_b(st: SparseTensor, query_xyz: jax.Array,
                            query_mask: jax.Array,
                            idx: jax.Array) -> jax.Array:
    """Batched :func:`interpolate_trilinear` without vmap.

    Batched gathers lower poorly on TPU (the vmapped form traced ~3x the
    per-row cost of a flat gather at b=2); this flattens samples into the
    row space — absolute row = local row + sample*N, one flat
    :func:`segment.gather_rows` (scatter-free backward) over B*Q*8 rows.
    ``idx`` is the precomputed (B, Q, 8) corner lookup (``fpn_tables``).
    """
    from .segment import gather_rows
    b, n = st.mask.shape
    c = st.feats.shape[-1]
    base = jnp.floor(query_xyz)
    frac = query_xyz - base
    safe = jnp.where(st.mask[..., None], st.feats, 0).reshape(b * n, c)
    padded = jnp.concatenate([safe, jnp.zeros((1, c), safe.dtype)])
    offs = jnp.asarray(OFFSETS_2)  # (8, 3)
    w = jnp.prod(jnp.where(offs[None, None] == 1, frac[:, :, None, :],
                           1 - frac[:, :, None, :]), axis=-1)  # (B, Q, 8)
    aoff = (jnp.arange(b, dtype=idx.dtype) * n)[:, None, None]
    aidx = jnp.where(idx >= 0, idx + aoff, b * n)
    gathered = gather_rows(padded, aidx.reshape(-1)).reshape(
        b, query_xyz.shape[1], 8, c)
    out = jnp.sum(gathered * w[..., None], axis=2)
    return jnp.where(query_mask[..., None], out, 0)
