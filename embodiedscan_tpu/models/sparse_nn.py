"""Flax building blocks over the sparse voxel engine + the MinkResNet backbone.

TPU-native equivalent of the reference's MinkowskiEngine backbone
(``embodiedscan/models/backbones/mink_resnet.py:21-143``): same topology
(conv3 stride-2 stem + InstanceNorm + ReLU + maxpool2, then 4 stages of
stride-2 BasicBlocks), rebuilt on fixed-capacity sparse tensors where each
conv is a neighbor-gather plus one MXU matmul. All sparse tensors are batched
(leading B axis); sort-carrying coordinate ops are unrolled per sample
because TPU sorts degrade ~12x under a batch dimension (see ops.sparse.bmap).
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse as S

kaiming_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def bneighbor_table(st: S.SparseTensor, offsets: np.ndarray) -> jax.Array:
    """Batched neighbor table (B, N, K): one flat batched sort ('flat'
    mode, batch id in the key) or per-sample flat sorts (bmap modes)."""
    if S.BMAP_MODE == 'flat':
        return S.neighbor_table_b(st, offsets)
    return S.bmap(lambda c, m: S.neighbor_table(S.SparseTensor(c, None, m),
                                                offsets),
                  (0, 0))(st.coords, st.mask)


def bdownsample(st: S.SparseTensor, capacity: int) -> S.DownsampleMap:
    if S.BMAP_MODE == 'flat':
        return S.downsample_coords_b(st, capacity)
    return S.bmap(
        lambda c, m: S.downsample_coords(S.SparseTensor(c, None, m), capacity),
        (0, 0))(st.coords, st.mask)


class SparseConv(nn.Module):
    """Sparse convolution given a precomputed batched neighbor table."""

    features: int
    kernel_size: int = 27
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, mask, nbr, out_mask=None, t_nbr=None):
        cin = feats.shape[-1]
        w = self.param('kernel', kaiming_out,
                       (self.kernel_size, cin, self.features))
        b = self.param('bias', nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None
        # Flatten the batch into the row space instead of vmapping: batched
        # (vmap) gathers lower ~1.6x worse per row on TPU than one flat
        # gather over B*rows (traced at b=2 full scale: the three conv sites
        # scaled 3.1-3.6x for 2x batch under vmap — the whole b>1 anomaly).
        # Per-sample tables hold LOCAL row indices in every bmap mode, so
        # absolute rows are nbr + sample*N; -1 (absent) stays -1 and maps to
        # the shared zero row inside the flat kernels. The custom gather-only
        # VJPs (subm mirror / strided transpose) are unchanged: mirror and
        # transpose relations hold row-wise and never cross sample blocks.
        bsz, n = feats.shape[:2]
        m, kk = nbr.shape[1:]
        ff = feats.reshape(bsz * n, cin)
        fm = mask.reshape(bsz * n)
        offs = jnp.arange(bsz, dtype=nbr.dtype)[:, None, None] * n
        fnbr = jnp.where(nbr >= 0, nbr + offs, -1).reshape(bsz * m, kk)
        if out_mask is None and self.kernel_size == 27:
            # submanifold: mirror-symmetric table -> gather-only backward
            out = S.subm_gather_conv(ff, fm, fnbr, w)
            if b is not None:
                out = out + b
        elif t_nbr is not None:
            # strided with precomputed transpose table -> gather backward;
            # t_nbr indexes COARSE OUTPUT rows, so its offsets use m
            toffs = jnp.arange(bsz, dtype=t_nbr.dtype)[:, None, None] * m
            ft_nbr = jnp.where(t_nbr >= 0, t_nbr + toffs,
                               -1).reshape(bsz * n, -1)
            out = S.strided_gather_conv(ff, fm, fnbr, ft_nbr, w)
            if b is not None:
                out = out + b
        else:
            out = S.gather_matmul_conv(ff, fm, fnbr, w, b)
        out = out.reshape(bsz, m, self.features)
        om = mask if out_mask is None else out_mask
        return jnp.where(om[..., None], out, 0).astype(feats.dtype)


def strided_queries(st: S.SparseTensor, dmap: S.DownsampleMap,
                    offsets: np.ndarray) -> jax.Array:
    """Neighbor table for stride-2 convs: input rows at 2*o + k. (B, M, K)."""

    from ..ops.hashing import lookup_merge, lookup_merge_b

    if S.BMAP_MODE == 'flat':
        b, m = dmap.coords.shape[:2]
        k = offsets.shape[0]
        q = (dmap.coords[:, :, None, :] * 2 +
             jnp.asarray(offsets)[None, None]).reshape(b, m * k, 3)
        qm = jnp.repeat(dmap.mask, k, axis=1)
        return lookup_merge_b(st.coords, st.mask, q, qm).reshape(b, m, k)

    def one(coords, mask, ocoords, omask):
        q = (ocoords[:, None, :] * 2 + jnp.asarray(offsets)[None]).reshape(-1, 3)
        qm = jnp.repeat(omask, offsets.shape[0])
        return lookup_merge(coords, mask, q, qm).reshape(ocoords.shape[0], -1)

    return S.bmap(one, (0, 0, 0, 0))(st.coords, st.mask, dmap.coords,
                                     dmap.mask)


def stage_tables(st: S.SparseTensor, dmap: S.DownsampleMap,
                 with_transpose: bool = False):
    """Fused (strided, submanifold[, transpose]) tables for one ResNet stage.

    All tables depend only on the fine coords and the downsample result, so
    their sorts fuse into two (``lookup_merge_multi``): the strided conv
    gathers fine rows at ``2*o + k``, every later submanifold conv in the
    stage gathers coarse rows at ``o + k``, and (training only) the strided
    conv's backward gathers coarse rows at ``(j - k) / 2`` — the transpose
    table consumed by ``strided_gather_conv``.
    """
    from ..ops.hashing import lookup_merge_multi, lookup_merge_multi_b
    # the subm stream's center offset is identity (a valid voxel contains
    # itself): query the other 26 and splice the arange column back in
    cix = S._center_offset(S.OFFSETS_3)
    offs = jnp.asarray(S.OFFSETS_3)
    noffs = jnp.asarray(np.delete(S.OFFSETS_3, cix, axis=0))

    if S.BMAP_MODE == 'flat':
        b, n = st.coords.shape[:2]
        m = dmap.coords.shape[1]
        ko = offs.shape[0]
        sq = (dmap.coords[:, :, None, :] * 2 +
              offs[None, None]).reshape(b, m * ko, 3)
        nq = (dmap.coords[:, :, None, :] +
              noffs[None, None]).reshape(b, m * (ko - 1), 3)
        qm = jnp.repeat(dmap.mask, ko, axis=1)
        nqm = jnp.repeat(dmap.mask, ko - 1, axis=1)
        pairs = [(st.coords, st.mask, sq, qm),
                 (dmap.coords, dmap.mask, nq, nqm)]
        if with_transpose:
            tq = st.coords[:, :, None, :] - offs[None, None]  # (B, N, 27, 3)
            even = jnp.all(tq % 2 == 0, axis=-1).reshape(b, -1)
            tqm = jnp.repeat(st.mask, ko, axis=1) & even
            pairs.append((dmap.coords, dmap.mask,
                          jnp.floor_divide(tq, 2).reshape(b, -1, 3), tqm))
        res = lookup_merge_multi_b(pairs)
        s_idx = res[0].reshape(b, m, ko)
        n26 = res[1].reshape(b, m, ko - 1)
        ident = jnp.where(dmap.mask, jnp.arange(m, dtype=jnp.int32)[None],
                          -1)
        n_idx = jnp.concatenate(
            [n26[..., :cix], ident[..., None], n26[..., cix:]], axis=-1)
        t_idx = res[2].reshape(b, n, ko) if with_transpose else None
        return s_idx, n_idx, t_idx

    def one(fc, fm, cc, cm):
        m = cc.shape[0]
        n = fc.shape[0]
        ko = offs.shape[0]
        sq = (cc[:, None, :] * 2 + offs[None]).reshape(-1, 3)
        nq = (cc[:, None, :] + noffs[None]).reshape(-1, 3)
        qm = jnp.repeat(cm, ko)
        nqm = jnp.repeat(cm, ko - 1)
        pairs = [(fc, fm, sq, qm), (cc, cm, nq, nqm)]
        if with_transpose:
            tq = fc[:, None, :] - offs[None]  # (N, 27, 3)
            even = jnp.all(tq % 2 == 0, axis=-1).reshape(-1)
            tqm = jnp.repeat(fm, ko) & even
            pairs.append((cc, cm, jnp.floor_divide(tq, 2).reshape(-1, 3),
                          tqm))
        res = lookup_merge_multi(pairs)
        s_idx = res[0].reshape(m, -1)
        n26 = res[1].reshape(m, ko - 1)
        ident = jnp.where(cm, jnp.arange(m, dtype=jnp.int32), -1)
        n_idx = jnp.concatenate(
            [n26[:, :cix], ident[:, None], n26[:, cix:]], axis=1)
        if with_transpose:
            return s_idx, n_idx, res[2].reshape(n, -1)
        return s_idx, n_idx, jnp.zeros((n, ko), jnp.int32)

    out = S.bmap(one, (0, 0, 0, 0))(st.coords, st.mask, dmap.coords,
                                    dmap.mask)
    return out if with_transpose else (out[0], out[1], None)


def _fpn_code_tables():
    """Static code tables for the structured FPN lattice arithmetic.

    Child coords are ``2p + b`` (b in OFFSETS_2 order, slot ``p*8+code(b)``),
    so for a child bit b and subm offset o: per axis ``t = b + o`` in
    {-1..2} decomposes as parent offset ``floor(t/2)`` in {-1,0,1} and child
    bit ``t mod 2`` — every child neighbor lives in a child slot of one of
    the parent's 27 neighbors. Returns (po_code (8,27) column into the
    parent 27-table, cb_code (8,27) child-slot bit code, corner_cols (8,)
    parent-table columns holding the trilinear corners of ``c/2``).
    """
    code3 = {tuple(o): i for i, o in enumerate(S.OFFSETS_3.tolist())}
    po = np.zeros((8, 27), np.int32)
    cb = np.zeros((8, 27), np.int32)
    for ci, bbits in enumerate(S.OFFSETS_2.tolist()):
        for ko, off in enumerate(S.OFFSETS_3.tolist()):
            t = np.asarray(bbits) + np.asarray(off)
            par = np.floor_divide(t, 2)
            bit = t - 2 * par
            po[ci, ko] = code3[tuple(par.tolist())]
            cb[ci, ko] = (bit[0] << 2) | (bit[1] << 1) | bit[2]
    # floor((2p+b)/2) == p for b in {0,1}, so the 8 trilinear corners of
    # c/2 are p + OFFSETS_2 for EVERY child of p
    corner_cols = np.array([code3[tuple(d)] for d in S.OFFSETS_2.tolist()],
                           np.int32)
    # one-hot selection matrices: a lane-axis gather of 216 (or 8) columns
    # from a 27-lane table runs at ~7 GB/s on TPU (r4 trace, 6.6 ms/step);
    # the same selection as an f32 matmul rides the MXU. Exact: table
    # values are row indices < 2^24.
    po_mat = np.zeros((27, 216), np.float32)
    po_mat[po.reshape(-1), np.arange(216)] = 1.0
    corner_mat = np.zeros((27, 8), np.float32)
    corner_mat[corner_cols, np.arange(8)] = 1.0
    # static trilinear weights of child ci at its 8 parent corners: child
    # query is p + b/2 (frac b/2 per axis in {0, .5}), corner offset d in
    # {0,1}^3 -> w = prod_axis (d ? frac : 1-frac)
    tri_w = np.zeros((8, 8), np.float32)
    for ci, bbits in enumerate(S.OFFSETS_2.tolist()):
        for j, d in enumerate(S.OFFSETS_2.tolist()):
            w = 1.0
            for a in range(3):
                f = bbits[a] * 0.5
                w *= f if d[a] else (1.0 - f)
            tri_w[ci, j] = w
    return po, cb, corner_cols, po_mat, corner_mat, tri_w


_FPN_CODES = _fpn_code_tables()


def fpn_tables(parent_nbr: jax.Array, pcoords: jax.Array, pmask: jax.Array,
               lateral: S.SparseTensor
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Coordinate tables for one FPN top-down level, derived structurally.

    The generative transpose emits children ``2p + b`` in parent-major
    order, so the three per-level lookups reduce to lattice arithmetic on
    the COARSE level's existing 27-neighbor table (``parent_nbr``, the one
    its out-block conv already built) plus one small parent lookup for the
    lateral coords — replacing the former 2.4M-row merged sort per level
    (measured 9+ ms/step at full scale) with gather-free index math:

    - children subm table: neighbor of child (p, b) at offset o is child
      slot ``parent_nbr[p][po(b,o)] * 8 + cb(b,o)`` (see _fpn_code_tables);
    - prune interpolation: the corners of ``c/2`` are ``p + {0,1}^3`` for
      every child of p — 8 fixed columns of ``parent_nbr``;
    - lateral match: ``l -> (floor(l/2) found in pcoords) * 8 + code(l&1)``.

    Returns:
        (nbr (B,8P,27), lateral_idx (B,L), corner_idx (B,P,8)) — the prune
        interpolation corners are PER PARENT (all 8 children of p share
        them); :func:`fpn_prune_scores` expands to per-child scores with a
        static trilinear weight matmul.
    """
    from ..ops.hashing import lookup_merge, lookup_merge_b
    po, cb, corner_cols, po_mat, corner_mat, _ = _FPN_CODES
    b, p = pcoords.shape[:2]
    pf = parent_nbr.astype(jnp.float32)  # exact: row indices < 2^24
    pn = (pf @ jnp.asarray(po_mat)).astype(jnp.int32).reshape(b, p, 8, 27)
    nbr = jnp.where(pn >= 0, pn * 8 + jnp.asarray(cb)[None, None],
                    -1).reshape(b, p * 8, 27)
    corners = (pf @ jnp.asarray(corner_mat)).astype(jnp.int32)  # (B, P, 8)
    lq = jnp.floor_divide(lateral.coords, 2)
    bits = lateral.coords - lq * 2
    lcode = (bits[..., 0] << 2) | (bits[..., 1] << 1) | bits[..., 2]
    if S.BMAP_MODE == 'flat':
        pidx = lookup_merge_b(pcoords, pmask, lq, lateral.mask)
    else:
        pidx = S.bmap(lookup_merge, (0, 0, 0, 0))(pcoords, pmask, lq,
                                                  lateral.mask)
    lat = jnp.where(pidx >= 0, pidx * 8 + lcode, -1)
    return nbr, lat, corners


def fpn_prune_scores(pscores: jax.Array, pmask: jax.Array,
                     corner_idx: jax.Array, child_mask: jax.Array
                     ) -> jax.Array:
    """Per-child FPN prune scores from per-parent corner gathers.

    Replaces ``interpolate_trilinear_b`` at the children lattice (8P x 8
    scalar gathers traced at 1.7 GB/s, ~6.5 ms/step at full scale): gather
    the 8 corner scores once per PARENT (P x 8) and expand to the 8
    children with the static (8, 8) trilinear weight matrix — children of
    p query ``p + b/2`` whose floor is always p, so weights depend only on
    the child bit pattern. Matches the reference's prune interpolation
    semantics (fcaf3d_head.py:287-292: absent corners contribute zero,
    masked rows score zero).

    Args:
        pscores: (B, P) parent prune scores.
        pmask: (B, P) parent validity.
        corner_idx: (B, P, 8) parent-level corner rows (fpn_tables).
        child_mask: (B, 8P) children validity.

    Returns:
        (B, 8P) child scores (child slot p*8+ci).
    """
    _, _, _, _, _, tri_w = _FPN_CODES
    b, p = pscores.shape
    safe = jnp.where(pmask, pscores, 0).reshape(b * p)
    padded = jnp.concatenate([safe, jnp.zeros((1,), safe.dtype)])
    aoff = (jnp.arange(b, dtype=corner_idx.dtype) * p)[:, None, None]
    aidx = jnp.where(corner_idx >= 0, corner_idx + aoff, b * p)
    corner_s = padded[aidx.reshape(-1)].reshape(b, p, 8)
    child = jnp.einsum('bpj,cj->bpc', corner_s,
                       jnp.asarray(tri_w)).reshape(b, p * 8)
    return jnp.where(child_mask, child, 0)


def fpn_tables_merge(up: S.SparseTensor, lateral: S.SparseTensor,
                     pcoords: jax.Array, pmask: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Merge-join FPN tables via generic fused coordinate lookups.

    CONTRACT: ``up`` must satisfy the key-sorted engine invariant —
    ``lookup_merge``'s cummax join returns WRONG rows on unsorted tables.
    The generative-tconv children lattice is parent-major (NOT sorted), so
    this must not be fed that lattice directly; :func:`fpn_tables` is the
    production path (structural, order-independent, and sort-free). Kept
    for the bmap-mode equivalence tests, which use sorted tables.

    Returns:
        (nbr (B,N,27), lateral_idx (B,L), interp_idx (B,N,8)).
    """
    from ..ops.hashing import lookup_merge_multi, lookup_merge_multi_b
    offs3 = jnp.asarray(S.OFFSETS_3)

    if S.BMAP_MODE == 'flat':
        b, n = up.coords.shape[:2]
        ko = offs3.shape[0]
        nq = (up.coords[:, :, None, :] +
              offs3[None, None]).reshape(b, n * ko, 3)
        iq = S.interp_queries(
            up.coords.reshape(-1, 3).astype(jnp.float32) / 2.0
        ).reshape(b, n * 8, 3)
        nbr, lat, itp = lookup_merge_multi_b([
            (up.coords, up.mask, nq, jnp.repeat(up.mask, ko, axis=1)),
            (up.coords, up.mask, lateral.coords, lateral.mask),
            (pcoords, pmask, iq, jnp.repeat(up.mask, 8, axis=1)),
        ])
        return nbr.reshape(b, n, ko), lat, itp.reshape(b, n, 8)

    def one(uc, um, lc, lm, pc, pm):
        n = uc.shape[0]
        nq = (uc[:, None, :] + offs3[None]).reshape(-1, 3)
        iq = S.interp_queries(uc.astype(jnp.float32) / 2.0).reshape(-1, 3)
        nbr, lat, itp = lookup_merge_multi([
            (uc, um, nq, jnp.repeat(um, offs3.shape[0])),
            (uc, um, lc, lm),
            (pc, pm, iq, jnp.repeat(um, 8)),
        ])
        return nbr.reshape(n, -1), lat, itp.reshape(n, 8)

    return S.bmap(one, (0, 0, 0, 0, 0, 0))(up.coords, up.mask,
                                           lateral.coords, lateral.mask,
                                           pcoords, pmask)


class SparseBasicBlock(nn.Module):
    """ME ResNet BasicBlock: conv3-BN-ReLU-conv3-BN + identity, ReLU."""

    features: int

    @nn.compact
    def __call__(self, feats, mask, nbr, train: bool):
        from .norm import MaskedBatchNorm
        identity = feats
        out = SparseConv(self.features)(feats, mask, nbr)
        out = MaskedBatchNorm()(out, mask, use_running_average=not train)
        out = nn.relu(out)
        out = SparseConv(self.features)(out, mask, nbr)
        out = MaskedBatchNorm()(out, mask, use_running_average=not train)
        out = nn.relu(out + identity)
        return jnp.where(mask[..., None], out, 0)


class SparseBottleneck(nn.Module):
    """ME ResNet Bottleneck: 1x1-BN-ReLU, conv3-BN-ReLU, 1x1x4-BN + id, ReLU.

    Mirrors MinkowskiEngine ``resnet_block.Bottleneck`` (expansion 4); 1x1
    sparse convs are pointwise, so they lower to masked Dense (one matmul).
    """

    features: int  # planes; output channels are 4 * planes

    @nn.compact
    def __call__(self, feats, mask, nbr, train: bool):
        from .norm import MaskedBatchNorm
        identity = feats
        out = nn.Dense(self.features, use_bias=False, kernel_init=kaiming_out,
                       name='conv1')(feats)
        out = MaskedBatchNorm()(out, mask, use_running_average=not train)
        out = nn.relu(out)
        out = SparseConv(self.features)(out, mask, nbr)
        out = MaskedBatchNorm()(out, mask, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Dense(self.features * 4, use_bias=False,
                       kernel_init=kaiming_out, name='conv3')(out)
        out = MaskedBatchNorm()(out, mask, use_running_average=not train)
        out = nn.relu(out + identity)
        return jnp.where(mask[..., None], out, 0)


class SparseStage(nn.Module):
    """One MinkResNet stage: strided block then ``blocks - 1`` submanifold ones.

    ``block='basic'`` matches ME BasicBlock stages (depths 18/34);
    ``block='bottleneck'`` matches ME Bottleneck stages (depths 50/101/152),
    where the stride sits on the middle 3x3 conv and the stage output has
    ``4 * features`` channels.
    """

    features: int
    blocks: int
    capacity: int
    block: str = 'basic'

    @nn.compact
    def __call__(self, st: S.SparseTensor, train: bool) -> S.SparseTensor:
        from .norm import MaskedBatchNorm
        expansion = 1 if self.block == 'basic' else 4
        cout = self.features * expansion
        dmap = bdownsample(st, self.capacity)
        # strided + submanifold (+ transpose for backward) tables share one
        # fused sort; the transpose table is only built when training
        s_nbr, nbr, t_nbr = stage_tables(st, dmap, with_transpose=train)
        if self.block == 'basic':
            out = SparseConv(self.features)(st.feats, st.mask, s_nbr,
                                            out_mask=dmap.mask, t_nbr=t_nbr)
            out = MaskedBatchNorm()(out, dmap.mask,
                                    use_running_average=not train)
            out = nn.relu(out)
            out = SparseConv(self.features)(out, dmap.mask, nbr)
            out = MaskedBatchNorm()(out, dmap.mask,
                                    use_running_average=not train)
        else:
            # bottleneck: 1x1 (input lattice) -> strided 3x3 -> 1x1 expand
            out = nn.Dense(self.features, use_bias=False,
                           kernel_init=kaiming_out, name='b0_conv1')(st.feats)
            out = MaskedBatchNorm()(out, st.mask,
                                    use_running_average=not train)
            out = nn.relu(jnp.where(st.mask[..., None], out, 0))
            out = SparseConv(self.features)(out, st.mask, s_nbr,
                                            out_mask=dmap.mask, t_nbr=t_nbr)
            out = MaskedBatchNorm()(out, dmap.mask,
                                    use_running_average=not train)
            out = nn.relu(out)
            out = nn.Dense(cout, use_bias=False, kernel_init=kaiming_out,
                           name='b0_conv3')(out)
            out = MaskedBatchNorm()(out, dmap.mask,
                                    use_running_average=not train)
        # downsample branch: 1x1 stride-2 conv + BN (inverse-map, no sort)
        d_nbr = jax.vmap(S.center_child_index)(st, dmap)
        down = SparseConv(cout, kernel_size=1)(st.feats, st.mask, d_nbr,
                                               out_mask=dmap.mask)
        down = MaskedBatchNorm()(down, dmap.mask, use_running_average=not train)
        feats = nn.relu(out + down)
        feats = jnp.where(dmap.mask[..., None], feats, 0)
        for _ in range(self.blocks - 1):
            if self.block == 'basic':
                feats = SparseBasicBlock(self.features)(feats, dmap.mask, nbr,
                                                        train)
            else:
                feats = SparseBottleneck(self.features)(feats, dmap.mask, nbr,
                                                        train)
        return S.SparseTensor(dmap.coords, feats, dmap.mask)


class ChannelMapper(nn.Module):
    """Per-level channel unification over sparse tensors.

    Rebuild of the reference's ME ``ChannelMapper``
    (``embodiedscan/models/necks/channel_mapper.py:19-94``): one
    conv(kernel_size)-BN-ELU block per input level. ``kernel_size=1`` lowers
    to a masked Dense (pointwise matmul); ``kernel_size=3`` gathers the
    27-neighborhood.
    """

    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[S.SparseTensor],
                 train: bool = True) -> Tuple[S.SparseTensor, ...]:
        from .norm import MaskedBatchNorm
        outs = []
        for i, st in enumerate(inputs):
            if self.kernel_size == 1:
                f = nn.Dense(self.out_channels, use_bias=False,
                             kernel_init=kaiming_out,
                             name=f'conv_{i}')(st.feats)
            else:
                nbr = bneighbor_table(st, S.OFFSETS_3)
                f = SparseConv(self.out_channels, name=f'conv_{i}')(
                    st.feats, st.mask, nbr)
            f = MaskedBatchNorm(name=f'bn_{i}')(
                f, st.mask, use_running_average=not train)
            f = nn.elu(f)
            outs.append(S.SparseTensor(st.coords,
                                       jnp.where(st.mask[..., None], f, 0),
                                       st.mask))
        return tuple(outs)


class MinkResNet(nn.Module):
    """Sparse 3D ResNet backbone (reference mink_resnet.py:21-143).

    Args:
        depth: one of {18, 34, 50, 101, 152}; BasicBlock for 18/34 (the
            reference detection configs use 34 — configs/detection/
            mv-det3d...py:36), Bottleneck (x4 channels) for 50/101/152.
        capacities: static voxel capacities for (stem, pool, stage1..4).
        num_stages / pool: reference MinkResNet knobs (mink_resnet.py:43-55).
    """

    depth: int = 34
    capacities: Sequence[int] = (65536, 32768, 24576, 8192, 4096, 2048)
    num_stages: int = 4
    pool: bool = True
    # jax.checkpoint each stage in the backward pass (HBM for recompute);
    # explicit stage names keep the param tree identical either way
    remat: bool = False

    arch = {18: ('basic', (2, 2, 2, 2)), 34: ('basic', (3, 4, 6, 3)),
            50: ('bottleneck', (3, 4, 6, 3)),
            101: ('bottleneck', (3, 4, 23, 3)),
            152: ('bottleneck', (3, 8, 36, 3))}

    @nn.compact
    def __call__(self, st: S.SparseTensor,
                 train: bool = True) -> Tuple[S.SparseTensor, ...]:
        from .norm import MaskedInstanceNorm
        block, stage_blocks = self.arch[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        # stem: conv3 stride 2 -> InstanceNorm -> ReLU -> maxpool2
        dmap = bdownsample(st, self.capacities[0])
        s_nbr = strided_queries(st, dmap, S.OFFSETS_3)
        feats = SparseConv(64)(st.feats, st.mask, s_nbr, out_mask=dmap.mask)
        feats = MaskedInstanceNorm()(feats, dmap.mask)
        feats = nn.relu(feats)
        x = S.SparseTensor(dmap.coords, feats, dmap.mask)
        if self.pool:
            pmap = bdownsample(x, self.capacities[1])
            x = jax.vmap(S.maxpool2)(x, pmap)

        stage_cls = nn.remat(SparseStage, static_argnums=(2,)) \
            if self.remat else SparseStage
        outs = []
        for i, blocks in enumerate(stage_blocks):
            x = stage_cls(64 * 2**i, blocks, self.capacities[2 + i],
                          block=block, name=f'SparseStage_{i}')(x, train)
            outs.append(x)
        return tuple(outs)
