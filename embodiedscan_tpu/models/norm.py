"""Masked normalization layers for sparse voxel features (flax.linen).

TPU equivalents of MinkowskiBatchNorm / MinkowskiInstanceNorm
(mink_resnet.py:64, fcaf3d_head.py:111) and the frozen 2D BatchNorm the
reference uses for the image backbone (``norm_cfg requires_grad=False,
norm_eval=True`` — configs/detection/mv-det3d...py:30-32): statistics are
computed only over valid (masked) voxel rows.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all valid rows of a (B, N, C) masked feature tensor."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, feats, mask, use_running_average=None):
        use_ra = nn.merge_param('use_running_average',
                                self.use_running_average, use_running_average)
        c = feats.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            f32 = feats.astype(jnp.float32)
            mean = jnp.sum(f32 * m, axis=tuple(range(f32.ndim - 1))) / cnt
            var = jnp.sum(
                jnp.square(f32 - mean) * m,
                axis=tuple(range(f32.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)
        out = (feats - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out * scale + bias
        return jnp.where(mask[..., None], out, 0).astype(feats.dtype)


class MaskedInstanceNorm(nn.Module):
    """InstanceNorm: per-sample, per-channel stats over valid voxels.

    Matches ME.MinkowskiInstanceNorm used in the MinkResNet stem
    (mink_resnet.py:64).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats, mask):
        c = feats.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        m = mask[..., None].astype(jnp.float32)
        f32 = feats.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(f32 * m, axis=-2, keepdims=True) / cnt
        var = jnp.sum(jnp.square(f32 - mean) * m, axis=-2, keepdims=True) / cnt
        out = (f32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out * scale + bias
        return jnp.where(mask[..., None], out, 0).astype(feats.dtype)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with loadable statistics (2D backbone)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((c,), jnp.float32))
        out = (x - mean.value) * jax.lax.rsqrt(var.value + self.epsilon)
        return (out * scale + bias).astype(x.dtype)
