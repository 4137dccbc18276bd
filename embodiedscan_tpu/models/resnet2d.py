"""2D image backbone: mmdet-style ResNet in flax (NHWC, bf16-friendly).

Mirrors the reference's image branch (``mmdet.ResNet`` with depth=50,
base_channels=16, 'pytorch' style, frozen BN —
configs/detection/mv-det3d...py:24-34): 7x7 stem + 4 Bottleneck stages with
out_indices (0, 1, 2, 3), feature strides (4, 8, 16, 32). BatchNorm is frozen
(norm_eval=True in the reference), so it is a fixed affine transform here;
stage freezing is applied by the optimizer mask at the train-loop level.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import FrozenBatchNorm


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool (pad 1) as 9 shifted strided slices.

    Bit-identical to ``nn.max_pool(x, (3, 3), strides=(2, 2),
    padding=((1, 1), (1, 1)))`` but lowers to strided slices + elementwise
    maxima instead of ``reduce_window``; the backward becomes fused selects
    rather than TPU's slow ``select-and-scatter`` (the stem pool traced
    18 ms/step at full scale, PERF.md r3 ledger).
    """
    n, h, w, c = x.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.slice(xp, (0, dy, dx, 0),
                              (n, dy + 2 * ho - 1, dx + 2 * wo - 1, c),
                              (1, 2, 2, 1))
            out = s if out is None else jnp.maximum(out, s)
    return out


class Bottleneck(nn.Module):
    """ResNet Bottleneck ('pytorch' style: stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = FrozenBatchNorm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype)(out)
        out = FrozenBatchNorm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = FrozenBatchNorm()(out)
        if self.stride != 1 or identity.shape[-1] != out.shape[-1]:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(identity)
            identity = FrozenBatchNorm()(identity)
        return nn.relu(out + identity)


class BasicBlock2d(nn.Module):
    """ResNet BasicBlock for depth 18/34."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype)(x)
        out = FrozenBatchNorm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = FrozenBatchNorm()(out)
        if self.stride != 1 or identity.shape[-1] != out.shape[-1]:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(identity)
            identity = FrozenBatchNorm()(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """mmdet-style ResNet returning multi-scale NHWC features."""

    depth: int = 50
    base_channels: int = 16
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32
    # rematerialize each residual block's activations in the backward pass
    # (jax.checkpoint): trades recompute FLOPs for HBM, unlocking larger
    # batch x view products. Explicit block names keep the param tree
    # identical with remat on or off.
    remat: bool = False

    arch = {
        18: (BasicBlock2d, (2, 2, 2, 2)),
        34: (BasicBlock2d, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
    }

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        block, stage_blocks = self.arch[self.depth]
        if self.remat:
            block = nn.remat(block)
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name='stem_conv')(x)
        x = FrozenBatchNorm(name='stem_bn')(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        outs = []
        for i, blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stride = 1 if i == 0 else 2
            x = block(planes, stride, dtype=self.dtype,
                      name=f'layer{i + 1}_0')(x)
            for j in range(blocks - 1):
                x = block(planes, 1, dtype=self.dtype,
                          name=f'layer{i + 1}_{j + 1}')(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
