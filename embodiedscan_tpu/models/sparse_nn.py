"""Flax building blocks over the sparse voxel engine + the MinkResNet backbone.

TPU-native equivalent of the reference's MinkowskiEngine backbone
(``embodiedscan/models/backbones/mink_resnet.py:21-143``): same topology
(conv3 stride-2 stem + InstanceNorm + ReLU + maxpool2, then 4 stages of
stride-2 BasicBlocks), rebuilt on fixed-capacity sparse tensors where each
conv is a neighbor-gather plus one MXU matmul. All sparse tensors are batched
(leading B axis) and coordinate ops are vmapped.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse as S

kaiming_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def bneighbor_table(st: S.SparseTensor, offsets: np.ndarray) -> jax.Array:
    """Batched neighbor table: (B, N, K)."""
    return jax.vmap(lambda c, m: S.neighbor_table(S.SparseTensor(c, None, m),
                                                  offsets))(st.coords, st.mask)


def bdownsample(st: S.SparseTensor, capacity: int) -> S.DownsampleMap:
    return jax.vmap(
        lambda c, m: S.downsample_coords(S.SparseTensor(c, None, m), capacity)
    )(st.coords, st.mask)


class SparseConv(nn.Module):
    """Sparse convolution given a precomputed batched neighbor table."""

    features: int
    kernel_size: int = 27
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, mask, nbr, out_mask=None):
        cin = feats.shape[-1]
        w = self.param('kernel', kaiming_out,
                       (self.kernel_size, cin, self.features))
        b = self.param('bias', nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None
        out = jax.vmap(S.gather_matmul_conv,
                       in_axes=(0, 0, 0, None, None))(feats, mask, nbr, w, b)
        om = mask if out_mask is None else out_mask
        return jnp.where(om[..., None], out, 0).astype(feats.dtype)


def strided_queries(st: S.SparseTensor, dmap: S.DownsampleMap,
                    offsets: np.ndarray) -> jax.Array:
    """Neighbor table for stride-2 convs: input rows at 2*o + k. (B, M, K)."""

    from ..ops.hashing import lookup_merge

    def one(coords, mask, ocoords, omask):
        q = (ocoords[:, None, :] * 2 + jnp.asarray(offsets)[None]).reshape(-1, 3)
        qm = jnp.repeat(omask, offsets.shape[0])
        return lookup_merge(coords, mask, q, qm).reshape(ocoords.shape[0], -1)

    return jax.vmap(one)(st.coords, st.mask, dmap.coords, dmap.mask)


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


class SparseStage(nn.Module):
    """One MinkResNet stage: strided block then ``blocks - 1`` submanifold ones."""

    features: int
    blocks: int
    capacity: int

    @nn.compact
    def __call__(self, st: S.SparseTensor, train: bool) -> S.SparseTensor:
        from .norm import MaskedBatchNorm
        dmap = bdownsample(st, self.capacity)
        s_nbr = strided_queries(st, dmap, S.OFFSETS_3)
        out = SparseConv(self.features)(st.feats, st.mask, s_nbr,
                                        out_mask=dmap.mask)
        out = MaskedBatchNorm()(out, dmap.mask, use_running_average=not train)
        out = nn.relu(out)
        nbr = bneighbor_table(S.SparseTensor(dmap.coords, None, dmap.mask),
                              S.OFFSETS_3)
        out = SparseConv(self.features)(out, dmap.mask, nbr)
        out = MaskedBatchNorm()(out, dmap.mask, use_running_average=not train)
        # downsample branch: 1x1 stride-2 conv + BN (inverse-map, no sort)
        d_nbr = jax.vmap(S.center_child_index)(st, dmap)
        down = SparseConv(self.features, kernel_size=1)(st.feats, st.mask,
                                                        d_nbr,
                                                        out_mask=dmap.mask)
        down = MaskedBatchNorm()(down, dmap.mask, use_running_average=not train)
        feats = nn.relu(out + down)
        feats = jnp.where(dmap.mask[..., None], feats, 0)
        for _ in range(self.blocks - 1):
            feats = SparseBasicBlock(self.features)(feats, dmap.mask, nbr,
                                                    train)
        return S.SparseTensor(dmap.coords, feats, dmap.mask)


class MinkResNet(nn.Module):
    """Sparse 3D ResNet backbone (reference mink_resnet.py:21-143).

    Args:
        depth: 18 or 34 (BasicBlock variants; the reference detection configs
            use 34 — configs/detection/mv-det3d...py:36).
        capacities: static voxel capacities for (stem, pool, stage1..4).
    """

    depth: int = 34
    capacities: Sequence[int] = (65536, 32768, 24576, 8192, 4096, 2048)

    arch = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}

    @nn.compact
    def __call__(self, st: S.SparseTensor,
                 train: bool = True) -> Tuple[S.SparseTensor, ...]:
        from .norm import MaskedInstanceNorm
        stage_blocks = self.arch[self.depth]
        # stem: conv3 stride 2 -> InstanceNorm -> ReLU -> maxpool2
        dmap = bdownsample(st, self.capacities[0])
        s_nbr = strided_queries(st, dmap, S.OFFSETS_3)
        feats = SparseConv(64)(st.feats, st.mask, s_nbr, out_mask=dmap.mask)
        feats = MaskedInstanceNorm()(feats, dmap.mask)
        feats = nn.relu(feats)
        x = S.SparseTensor(dmap.coords, feats, dmap.mask)
        pmap = bdownsample(x, self.capacities[1])
        x = jax.vmap(S.maxpool2)(x, pmap)

        outs = []
        for i, blocks in enumerate(stage_blocks):
            x = SparseStage(64 * 2**i, blocks, self.capacities[2 + i])(x, train)
            outs.append(x)
        return tuple(outs)
