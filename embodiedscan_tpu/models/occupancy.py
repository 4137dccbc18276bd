"""Semantic occupancy prediction (dense fusion + continuous variants).

TPU-native rebuild of the reference occupancy stack:
- ``IndoorImVoxelNeck`` (models/necks/imvoxel_neck.py:9-144): 3-scale dense
  3D residual U-Net over the fused voxel volume.
- ``ImVoxelOccHead`` (models/dense_heads/imvoxel_occ_head.py:20-185):
  per-scale 1x1x1 classification with multi-scale supervision, CE +
  geometric/semantic scene-class affinity losses at 0.5^i scale weights.
- ``DenseFusionOccPredictor`` (models/detectors/dense_fusion_occ.py:27-467):
  image volume sampled at the prior voxel-center grid + sparse point branch
  densified and concatenated. The continuous variant
  (``EmbodiedOccPredictor``, embodied_occ.py:26-455) is the same network fed
  cumulative sweeps as a pseudo-batch by the data pipeline.

Volumes are NXYZC (channel-last) for TPU conv efficiency.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse as S
from .fpn import FPN
from .fusion import point_image_sample_batched
from .resnet2d import ResNet
from .sparse_nn import MinkResNet


class ResBlock3D(nn.Module):
    """Conv3d-BN-ReLU-Conv3d-BN residual block (imvoxel_neck.py:111-144)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.Conv(self.features, (3, 3, 3), strides=self.stride,
                      padding=1, use_bias=False, dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class ImVoxelNeck(nn.Module):
    """Dense 3D encoder-decoder U-Net (reference IndoorImVoxelNeck)."""

    in_channels: int
    out_channels: int = 128
    n_blocks: Sequence[int] = (1, 1, 1)
    # bf16 halves every U-Net activation (params stay f32): the continuous
    # 10-sweep pseudo-batch needs it to fit one 16 GB chip
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        n_scales = len(self.n_blocks)
        n_channels = self.in_channels
        down_outs = []
        for i, blocks in enumerate(self.n_blocks):
            stride = 1 if i == 0 else 2
            for j in range(blocks):
                if j == 0 and stride != 1:
                    n_channels *= 2
                    x = ResBlock3D(n_channels, stride, dtype=self.dtype,
                                   name=f'down_{i}_{j}')(x, train)
                else:
                    x = ResBlock3D(n_channels, 1, dtype=self.dtype,
                                   name=f'down_{i}_{j}')(x, train)
            down_outs.append(x)

        outs = []
        for i in range(n_scales - 1, -1, -1):
            if i < n_scales - 1:
                # transposed conv k2 s2 + BN + ReLU + conv3 + BN + ReLU
                c = down_outs[i].shape[-1]
                x = nn.ConvTranspose(c, (2, 2, 2), strides=(2, 2, 2),
                                     use_bias=False, dtype=self.dtype,
                                     name=f'up_{i + 1}_t')(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
                x = nn.Conv(c, (3, 3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name=f'up_{i + 1}_c')(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
                x = down_outs[i] + x
            out = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                          use_bias=False, dtype=self.dtype,
                          name=f'out_{i}_c')(x)
            out = nn.BatchNorm(use_running_average=not train,
                               dtype=self.dtype)(out)
            outs.append(nn.relu(out).astype(jnp.float32))
        return outs[::-1]


def occ_multiscale_targets(gt_occ: jax.Array, gt_mask: jax.Array, ratio: int,
                           shape: Tuple[int, int, int],
                           visible_mask: jax.Array | None = None) -> jax.Array:
    """Scatter sparse (M, 4) xyz+label gt into a /ratio grid (occ_loss.py:7).

    Returns (X, Y, Z) int labels, 0 = empty, 255 = ignore.
    """
    gx, gy, gz = shape
    coords = gt_occ[:, :3].astype(jnp.int32) // ratio
    labels = gt_occ[:, 3].astype(jnp.int32)
    inb = gt_mask & jnp.all(coords >= 0, -1) & (coords[:, 0] < gx) & \
        (coords[:, 1] < gy) & (coords[:, 2] < gz)
    flat = (coords[:, 0] * gy + coords[:, 1]) * gz + coords[:, 2]
    flat = jnp.where(inb, flat, gx * gy * gz)
    grid = jnp.zeros((gx * gy * gz + 1,), jnp.int32)
    grid = grid.at[flat].max(jnp.where(inb, labels, 0))
    grid = grid[:-1].reshape(gx, gy, gz)
    if visible_mask is not None:
        grid = jnp.where(visible_mask, grid, 255)
    return grid


def _bce_scalar(p):
    """BCE(p, 1) for a probability scalar (affinity losses)."""
    return -jnp.log(jnp.clip(p, min=1e-6, max=1.0))


def geo_scal_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Geometric scene-class affinity loss (occ_loss.py:39-80)."""
    probs = jax.nn.softmax(logits, axis=-1)
    empty = probs[..., 0]
    nonempty = 1 - empty
    known = target != 255
    tgt_nonempty = (target != 0) & known
    eps = 1e-6
    inter = jnp.sum(jnp.where(tgt_nonempty, nonempty, 0))
    precision = inter / (jnp.sum(jnp.where(known, nonempty, 0)) + eps)
    recall = inter / (jnp.sum(tgt_nonempty) + eps)
    tgt_empty = (target == 0) & known
    spec = jnp.sum(jnp.where(tgt_empty, empty, 0)) / (jnp.sum(tgt_empty) + eps)
    return _bce_scalar(precision) + _bce_scalar(recall) + _bce_scalar(spec)


def sem_scal_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Semantic scene-class affinity loss (occ_loss.py:82-139), vectorized
    over classes instead of the reference's Python loop."""
    probs = jax.nn.softmax(logits, axis=-1)  # (..., C)
    c = logits.shape[-1]
    known = (target != 255)
    flatp = probs.reshape(-1, c)
    flatt = target.reshape(-1)
    flatk = known.reshape(-1)
    onehot = (flatt[:, None] == jnp.arange(c)[None, :]) & flatk[:, None]
    p = jnp.where(flatk[:, None], flatp, 0)
    cnt_pos = jnp.sum(onehot, axis=0).astype(jnp.float32)  # per class
    nominator = jnp.sum(p * onehot, axis=0)
    sum_p = jnp.sum(p, axis=0)
    cnt_neg = jnp.sum(flatk) - cnt_pos

    precision = nominator / jnp.clip(sum_p, min=1e-12)
    recall = nominator / jnp.clip(cnt_pos, min=1e-12)
    spec = jnp.sum((1 - p) * (~onehot & flatk[:, None]), axis=0) / \
        jnp.clip(cnt_neg, min=1e-12)
    loss_c = jnp.where(sum_p > 0, _bce_scalar(precision), 0) + \
        jnp.where(cnt_pos > 0, _bce_scalar(recall), 0) + \
        jnp.where(cnt_neg > 0, _bce_scalar(spec), 0)
    active = cnt_pos > 0
    count = jnp.sum(active)
    return jnp.sum(jnp.where(active, loss_c, 0)) / jnp.clip(count, min=1.0)


class OccHead(nn.Module):
    """Per-scale 1x1x1 occupancy classifier (reference ImVoxelOccHead)."""

    num_classes: int = 81

    @nn.compact
    def __call__(self, mlvl_feats):
        return [
            nn.Dense(self.num_classes, use_bias=False, name=f'occ{i}')(f)
            for i, f in enumerate(mlvl_feats)
        ]

    def loss(self, occ_preds, gt_occ, gt_occ_mask, visible_masks=None):
        """Multi-scale CE + affinity losses (imvoxel_occ_head.py:110-185).

        Args:
            occ_preds: list of (B, X/r, Y/r, Z/r, C) logits.
            gt_occ: (B, M, 4) padded xyz+label sparse gt.
            gt_occ_mask: (B, M) validity.
            visible_masks: optional (B, X, Y, Z) bool visibility.
        """
        from .losses import cross_entropy_ignore
        losses = {}
        for i, pred in enumerate(occ_preds):
            ratio = 2**i
            shape = pred.shape[1:4]
            vis = None
            if visible_masks is not None:
                if ratio > 1:
                    vis = nn.max_pool(
                        visible_masks[..., None].astype(jnp.float32),
                        (ratio, ratio, ratio),
                        strides=(ratio, ratio, ratio))[..., 0] > 0
                else:
                    vis = visible_masks
            tgt = jax.vmap(occ_multiscale_targets,
                           in_axes=(0, 0, None, None, 0 if vis is not None
                                    else None))(gt_occ, gt_occ_mask, ratio,
                                                shape, vis)
            loss_i = cross_entropy_ignore(pred, tgt, 255) + \
                sem_scal_loss(pred, tgt) + geo_scal_loss(pred, tgt)
            losses[f'loss_occ_{i}'] = loss_i * (0.5**i)
        return losses

    def predict(self, occ_preds):
        """Softmax-argmax at the finest scale (imvoxel_occ_head.py:90-108)."""
        return jnp.argmax(occ_preds[0], axis=-1)


class DenseFusionOccPredictor(nn.Module):
    """Embodied Perceptron: multi-view semantic occupancy variant.

    Extra batch keys: ``gt_occ`` (B, M, 4), ``gt_occ_mask`` (B, M), optional
    ``visible_mask`` (B, X, Y, Z).
    """

    num_classes: int = 81
    n_voxels: Tuple[int, int, int] = (40, 40, 16)
    point_cloud_range: Tuple[float, ...] = (-3.2, -3.2, -0.78, 3.2, 3.2, 1.78)
    prior_range: Tuple[float, ...] = (-3.2, -3.2, -1.28, 3.2, 3.2, 1.28)
    prior_origin: Tuple[float, float, float] = (0.0, 0.0, 0.5)
    input_capacity: int = 65536
    backbone_capacities: Sequence[int] = (49152, 32768, 24576, 8192, 4096,
                                          2048)
    resnet_depth: int = 50
    resnet_base_channels: int = 64
    mink_depth: int = 34
    neck3d_channels: int = 128
    # U-Net compute dtype: bf16 halves the (sweeps, 40, 40, 16, 768..3072)
    # activation volumes (params stay f32)
    neck_dtype: jnp.dtype = jnp.float32
    fpn_channels: int = 256
    # optional 1x1 projection before the U-Net (0 = off). The reference
    # U-Net doubles from 768 channels (~700M params); this knob enables
    # smaller smoke/test variants without touching the U-Net topology.
    pre_neck_channels: int = 0
    # rematerialization ('none'|'2d'|'3d'|'all'): the continuous task's
    # 10-sweep pseudo-batch multiplies every sparse-branch activation by
    # the sweep count (10 x 65536-row stages OOM a 16 GB chip without it)
    remat: bool | str = False

    def _remat(self, which: str) -> bool:
        mode = {True: 'all', False: 'none'}.get(self.remat, self.remat)
        return mode in ('all', which)

    @property
    def voxel_size(self):
        # prior range / n_voxels / MinkResNet total stride 2^6
        # (dense_fusion_occ.py:88-97)
        return (self.prior_range[3] - self.prior_range[0]) / \
            self.n_voxels[0] / 64

    def _prior_points(self):
        """Aligned voxel-center grid via the anchor generator API.

        Mirrors ``prior_generator.grid_anchors([n_voxels[::-1]])[:, :3]``
        (embodied_occ.py:155-160) with the x-major flattening this model's
        volume reshape uses (the reference flattens z-major and permutes —
        same grid, different traversal order).
        """
        from .anchors import AlignedAnchor3DRangeGenerator
        nx, ny, nz = self.n_voxels
        gen = AlignedAnchor3DRangeGenerator(
            ranges=[list(self.prior_range)], sizes=[[1.0, 1.0, 1.0]],
            rotations=[0.0], reshape_out=False)
        a = gen.single_level_grid_anchors((nz, ny, nx), 1)  # (Z,Y,X,1,1,7)
        pts = a[..., 0, 0, :3].transpose(2, 1, 0, 3).reshape(-1, 3)
        pts = pts.astype(np.float32)
        return jnp.asarray(pts + np.asarray(self.prior_origin, np.float32))

    @nn.compact
    def __call__(self, batch: dict, train: bool = True, mode: str = 'loss'):
        imgs = batch['imgs']
        bi, v, h, w, _ = imgs.shape
        b = batch['points'].shape[0]
        # continuous pseudo-batches share one image set per scan (see
        # SparseFusionTrunk): s sweeps reuse the scan's feature maps
        assert b % bi == 0, (b, bi)
        s = b // bi
        feats2d = ResNet(depth=self.resnet_depth,
                         base_channels=self.resnet_base_channels,
                         remat=self._remat('2d'))(
                             imgs.reshape(bi * v, h, w, 3))
        f = FPN(out_channels=self.fpn_channels)(feats2d)[0]  # finest, stride 4
        hf, wf, c2 = f.shape[1:]
        f = f.reshape(bi, v, hf, wf, c2)

        prior = self._prior_points()  # (Nx*Ny*Nz, 3)
        view_mask = batch.get('view_mask')
        if view_mask is None:
            view_mask = jnp.ones((b, v), bool)
        # whole-batch fusion (one flat gather; scatter-free backward —
        # see models/fusion.py point_image_sample_batched)
        np_ = prior.shape[0]
        img_volume = point_image_sample_batched(
            jnp.broadcast_to(prior[None, None], (bi, s, np_, 3)),
            jnp.ones((bi, s, np_), bool), f, batch['proj'],
            batch['aug_inv'], (h, w), 'nearest', view_mask.reshape(bi, s, v))
        nx, ny, nz = self.n_voxels
        img_volume = img_volume.reshape(b, nx, ny, nz, c2)

        # sparse point branch: voxelize at the fine lattice, MinkResNet,
        # densify the coarsest stage into the prior grid
        # (dense_fusion_occ.py:223-258)
        pts = batch['points']
        shifted = pts - jnp.asarray(self.point_cloud_range[:3])
        st = jax.vmap(S.from_points, in_axes=(0, 0, 0, None, None))(
            shifted, pts, batch['points_mask'], self.voxel_size,
            self.input_capacity)
        levels = MinkResNet(depth=self.mink_depth,
                            capacities=tuple(self.backbone_capacities),
                            remat=self._remat('3d'))(st, train=train)
        top = levels[-1]  # stride 64 -> lattice == prior grid
        point_volume = jax.vmap(S.to_dense, in_axes=(0, None, None))(
            top, jnp.zeros((3,), jnp.int32), tuple(self.n_voxels))

        x = jnp.concatenate([img_volume, point_volume], axis=-1)
        if self.pre_neck_channels:
            x = nn.Dense(self.pre_neck_channels, name='pre_neck')(x)
        # the U-Net is 3D and sweep-scaled like the sparse stages
        neck_cls = nn.remat(ImVoxelNeck, static_argnums=(2,)) \
            if self._remat('3d') else ImVoxelNeck
        feats = neck_cls(x.shape[-1], self.neck3d_channels,
                         dtype=self.neck_dtype,
                         name='ImVoxelNeck_0')(x, train)
        head = OccHead(self.num_classes)
        preds = head(feats)
        if mode == 'feats':
            return preds
        if mode == 'loss':
            return head.loss(preds, batch['gt_occ'], batch['gt_occ_mask'],
                             batch.get('visible_mask'))
        return head.predict(preds)
