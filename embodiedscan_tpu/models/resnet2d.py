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


def _pool_slices(x: jnp.ndarray):
    """The 9 shifted stride-2 window slices of a 3x3/s2/pad-1 pool."""
    n, h, w, c = x.shape
    ho, wo = (h + 1) // 2, (w + 1) // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    out = []
    for dy in range(3):
        for dx in range(3):
            out.append(jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + 2 * ho - 1, dx + 2 * wo - 1, c), (1, 2, 2, 1)))
    return out


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_impl(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    slices = _pool_slices(x)
    out = slices[0]
    for s in slices[1:]:
        out = jnp.maximum(out, s)
    return out


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 max pool (pad 1) as 9 shifted strided slices.

    Bit-identical forward to ``nn.max_pool(x, (3, 3), strides=(2, 2),
    padding=((1, 1), (1, 1)))`` but lowers to strided slices + elementwise
    maxima instead of ``reduce_window``. The custom VJP routes each output
    gradient to the FIRST window element attaining the max (row-major in
    the window — torch MaxPool2d semantics) and assembles grad_x by
    shift+interleave of the 9 per-offset contribution fields: the naive
    slice backward emits 9 interior-padded ``pad`` HLOs ((N,241,241,64)
    writes at ~46 GB/s, ~29 ms/step at full scale in the r4 trace); this
    formulation is pure elementwise + unit shifts + one interleave reshape.
    """
    return _max_pool_impl(x, x.shape[1], x.shape[2])


def _max_pool_fwd(x, h, w):
    slices = _pool_slices(x)
    best = slices[0]
    idx = jnp.zeros(best.shape, jnp.int8)
    for k, s in enumerate(slices[1:], start=1):
        upd = s > best  # strict: first max (scan order) keeps the gradient
        best = jnp.where(upd, s, best)
        idx = jnp.where(upd, jnp.int8(k), idx)
    return best, idx


def _shift_up(a, axis):
    """a[..., i, ...] <- a[..., i+1, ...] with 0 fill at the end."""
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(1, None)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 1)
    return jnp.pad(a[tuple(sl)], pad)


def _max_pool_bwd(h, w, idx, g):
    n, ho, wo, c = g.shape
    # contribution of window offset k=(dy,dx): g where that offset won.
    # input row i = 2*wy - 1 + dy maps to (parity, window):
    #   even i=2wy   <- dy=1 at wy;  odd i=2wy+1 <- dy=2 at wy, dy=0 at wy+1
    c_ = {k: g * (idx == k) for k in range(9)}

    def comb(cyx, shifts):
        out = None
        for k, (sy, sx) in zip(cyx, shifts):
            t = c_[k]
            if sy:
                t = _shift_up(t, 1)
            if sx:
                t = _shift_up(t, 2)
            out = t if out is None else out + t
        return out

    kk = lambda dy, dx: dy * 3 + dx
    g00 = comb([kk(1, 1)], [(0, 0)])
    g01 = comb([kk(1, 2), kk(1, 0)], [(0, 0), (0, 1)])
    g10 = comb([kk(2, 1), kk(0, 1)], [(0, 0), (1, 0)])
    g11 = comb([kk(2, 2), kk(2, 0), kk(0, 2), kk(0, 0)],
               [(0, 0), (0, 1), (1, 0), (1, 1)])
    # interleave (wy, ry, wx, rx) -> rows 2wy+ry, cols 2wx+rx
    quad = jnp.stack([jnp.stack([g00, g01], 3), jnp.stack([g10, g11], 3)], 2)
    gx = quad.reshape(n, 2 * ho, 2 * wo, c)
    return (gx[:, :h, :w],)


_max_pool_impl.defvjp(_max_pool_fwd, _max_pool_bwd)


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
