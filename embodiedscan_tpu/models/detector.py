"""Multi-view sparse-fusion 3D detector (flax).

TPU-native rebuild of ``SparseFeatureFusionSingleStage3DDetector``
(``embodiedscan/models/detectors/sparse_featfusion_single_stage.py:29-426``):
voxelize aggregated multi-view points, run the sparse 3D backbone and the 2D
image backbone, project every voxel center into every view to fuse image
features (vectorized, no per-sample loops), and hand the fused multi-scale
sparse features to the FCAF3D head.

Batch layout (all static shapes):
    points:      (B, P, 3) world-frame xyz (use_xyz_feat -> also features)
    points_mask: (B, P)
    imgs:        (B, V, H, W, 3) normalized images
    proj:        (B, V, 4, 4) intrinsic @ extrinsic per view
    aug_inv:     (B, 4, 4) inverse 3D augmentation (identity at test time)
    gt_boxes/gt_labels/gt_mask: (B, G, 9)/(B, G)/(B, G) padded GT
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import sparse as S
from .fcaf3d import FCAF3DHead
from .fusion import point_image_sample
from .resnet2d import ResNet
from .sparse_nn import MinkResNet


class SparseFusionDetector(nn.Module):
    """Embodied Perceptron: multi-view 3D detection variant."""

    num_classes: int = 284
    voxel_size: float = 0.01
    input_capacity: int = 98304
    backbone_capacities: Sequence[int] = (65536, 32768, 24576, 8192, 4096,
                                          2048)
    fpn_capacities: Sequence[int] = (24576, 8192, 4096, 2048)
    max_dets: int = 256
    nms_pre: int = 1000
    max_candidates: int = 1024
    resnet_depth: int = 50
    mink_depth: int = 34
    img_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.resnet_depth, base_channels=16,
                               dtype=self.img_dtype)
        self.backbone_3d = MinkResNet(depth=self.mink_depth,
                                      capacities=tuple(
                                          self.backbone_capacities))
        strides = (8, 16, 32, 64)
        ch3d = (64, 128, 256, 512)
        expansion = 4 if self.resnet_depth >= 50 else 1
        ch2d = tuple(16 * 2**i * expansion for i in range(4))
        self.bbox_head = FCAF3DHead(
            num_classes=self.num_classes,
            in_channels=tuple(c3 + c2 for c3, c2 in zip(ch3d, ch2d)),
            voxel_size=self.voxel_size,
            strides=strides,
            fpn_capacities=tuple(self.fpn_capacities),
            nms_pre=self.nms_pre,
            max_candidates=self.max_candidates,
            max_dets=self.max_dets)
        self._strides = strides

    def extract_feat(self, batch: dict, train: bool):
        pts = batch['points']
        pmask = batch['points_mask']
        # voxelize: use_xyz_feat=True -> xyz are also the features
        # (sparse_featfusion_single_stage.py:110-114)
        st = jax.vmap(S.from_points, in_axes=(0, 0, 0, None, None))(
            pts, pts, pmask, self.voxel_size, self.input_capacity)
        levels = self.backbone_3d(st, train=train)

        imgs = batch['imgs'].astype(self.img_dtype)
        b, v, h, w, _ = imgs.shape
        feats2d = self.backbone(imgs.reshape(b * v, h, w, 3))
        fused = []
        for i, lvl in enumerate(levels):
            f2d = feats2d[i]
            hf, wf, c2 = f2d.shape[1:]
            f2d = f2d.reshape(b, v, hf, wf, c2).astype(jnp.float32)
            world = lvl.coords.astype(jnp.float32) * (
                self._strides[i] * self.voxel_size)
            img_feat = jax.vmap(point_image_sample,
                                in_axes=(0, 0, 0, 0, 0, None, None))(
                                    world, lvl.mask, f2d, batch['proj'],
                                    batch['aug_inv'], (h, w), 'nearest')
            fused.append(
                S.SparseTensor(
                    lvl.coords,
                    jnp.concatenate([lvl.feats, img_feat], axis=-1),
                    lvl.mask))
        return fused

    @nn.compact
    def __call__(self, batch: dict, train: bool = True, mode: str = 'loss'):
        feats = self.extract_feat(batch, train)
        outs = self.bbox_head(feats, train=train)
        if mode == 'feats':
            return outs
        if mode == 'loss':
            return self.bbox_head.loss(outs, batch['gt_boxes'],
                                       batch['gt_labels'], batch['gt_mask'])
        return self.bbox_head.predict(outs)
