"""EmbodiedScan on-disk dataset: info pkl + VG json -> packed batches.

Parses the reference's annotation format
(``embodiedscan/datasets/embodiedscan_dataset.py:93-226``):
- per-scan info dicts with ``images`` (img/depth paths, cam2global,
  visible_instance_ids), ``cam2img``/``depth_cam2img``, ``axis_align_matrix``
  and ``instances`` (9-DoF ``bbox_3d`` + ``bbox_label_3d``).
- extrinsic per view = inv(axis_align_matrix @ cam2global).
- depth shift 4000 for matterport3d, 1000 otherwise.
- grounding: VG json entries joined by scan id
  (``datasets/mv_3dvg_dataset.py:220-405``) with text + tokens_positive.

Images load via PIL; depth PNGs are uint16 millimeter maps. All outputs are
the same static-shape packed samples as the synthetic fixture.
"""

import json
import os
import pickle
from typing import Dict, Iterator, List

import numpy as np

from ..configs.base import Config
from . import pipeline as pl


def load_info_pkl(path: str):
    with open(path, 'rb') as f:
        data = pickle.load(f)
    if isinstance(data, dict) and 'data_list' in data:
        return data['data_list'], data.get('metainfo', {})
    return data, {}


def parse_scan(info: dict, data_root: str) -> dict:
    """One raw info dict -> scan record (embodiedscan_dataset.py:93-158)."""
    dataset = info['sample_idx'].split('/')[0]
    depth_shift = 4000.0 if dataset == 'matterport3d' else 1000.0
    axis_align = np.asarray(info['axis_align_matrix'], np.float64)
    views = []
    global_k = info.get('cam2img')
    for img in info['images']:
        cam2global = np.asarray(img['cam2global'], np.float64)
        extrinsic = np.linalg.inv(axis_align @ cam2global).astype(np.float32)
        k = img.get('cam2img', global_k)
        depth_k = img.get('depth_cam2img', info.get('depth_cam2img', k))
        views.append(
            dict(img_path=os.path.join(data_root, img['img_path']),
                 depth_path=os.path.join(data_root, img['depth_path']),
                 intrinsic=np.asarray(k, np.float32),
                 depth_intrinsic=np.asarray(depth_k, np.float32),
                 extrinsic=extrinsic,
                 visible_instance_ids=np.asarray(
                     img.get('visible_instance_ids', []), np.int64)))
    boxes = np.zeros((len(info.get('instances', [])), 9), np.float32)
    labels = np.zeros((len(boxes),), np.int64)
    for i, inst in enumerate(info.get('instances', [])):
        boxes[i] = np.asarray(inst['bbox_3d'], np.float32)
        labels[i] = inst['bbox_label_3d']
    return dict(scan_id=info['sample_idx'], views=views,
                depth_shift=depth_shift, gt_boxes=boxes, gt_labels=labels,
                occupancy_path=info.get('occupancy_path'))


def load_view(view: dict, depth_shift: float, image_hw) -> dict:
    """Load RGB + depth for one view, resize RGB, keep scaled intrinsics."""
    from PIL import Image
    h, w = image_hw
    rgb = Image.open(view['img_path']).convert('RGB')
    w0, h0 = rgb.size
    rgb = np.asarray(rgb.resize((w, h)), np.uint8)
    depth = np.asarray(Image.open(view['depth_path']),
                       np.float32) / depth_shift
    # fold the Resize scale factor into the projection intrinsic
    # (point_fusion.py:171-172 img_scale_factor)
    k = view['intrinsic'].copy()
    scale = np.diag([w / w0, h / h0, 1.0]).astype(np.float32)
    pad = np.eye(4, dtype=np.float32)
    kk = np.asarray(k, np.float32)
    pad[:kk.shape[0], :kk.shape[1]] = kk
    pad[:3] = scale @ pad[:3]
    return dict(rgb=rgb, depth=depth, intrinsic=pad,
                depth_intrinsic=view['depth_intrinsic'],
                extrinsic=view['extrinsic'])


class EmbodiedScanLoader:
    """Iterates packed samples from the on-disk dataset."""

    def __init__(self, cfg: Config, train: bool):
        self.cfg = cfg
        self.train = train
        d = cfg.data
        ann = d.ann_file if train else d.val_ann_file
        self.infos, self.metainfo = load_info_pkl(
            os.path.join(d.data_root, ann))
        self.batch_size = d.batch_size if train else 1
        if cfg.model.task == 'mv_grounding' and d.vg_file:
            with open(os.path.join(d.data_root, d.vg_file)) as f:
                self.vg = json.load(f)
        else:
            self.vg = None
        self.steps_per_epoch = max(
            1,
            len(self.infos) * max(1, d.repeat_times) // self.batch_size)

    def _build_sample(self, info: dict, seed: int) -> Dict[str, np.ndarray]:
        d = self.cfg.data
        rng = np.random.RandomState(seed)
        scan = parse_scan(info, d.data_root)
        n_views = d.n_views_train if self.train else d.n_views_test
        ids = pl.select_views(len(scan['views']), n_views,
                              ordered=not self.train, rng=rng)
        pts_list, exts, ks, imgs = [], [], [], []
        for i in ids:
            view = load_view(scan['views'][i], scan['depth_shift'],
                             tuple(d.image_hw))
            pts = pl.rgbd_to_points(view['depth'], view['depth_intrinsic'])
            pts_list.append(pl.point_sample(pts, d.points_per_view, rng))
            exts.append(view['extrinsic'])
            ks.append(view['intrinsic'])
            imgs.append(pl.normalize_imgs(view['rgb'][None],
                                          bgr_to_rgb=False)[0])
        points = pl.aggregate_points(pts_list, exts)
        boxes, labels = scan['gt_boxes'], scan['gt_labels']
        aug = None
        if self.train:
            if self.cfg.model.task in ('mv_det3d', 'cont_det3d'):
                points, boxes, fmat = pl.random_flip(points, boxes, rng)
            else:
                fmat = np.eye(4, dtype=np.float32)
            points, boxes, rmat = pl.global_rot_scale_trans(
                points, boxes, rng)
            aug = rmat @ fmat
        return pl.pack_sample(points, np.stack(imgs), ks, exts, boxes,
                              labels, aug, d.n_points, d.max_boxes, rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.infos))
        rng = np.random.RandomState(self.cfg.seed)
        epoch_len = len(order) * max(1, self.cfg.data.repeat_times)
        while True:
            if self.train:
                idx = rng.permutation(epoch_len) % len(order)
            else:
                idx = order
            for start in range(0, len(idx) - self.batch_size + 1,
                               self.batch_size):
                chunk = idx[start:start + self.batch_size]
                samples = [
                    self._build_sample(self.infos[i],
                                       int(rng.randint(1 << 30)))
                    for i in chunk
                ]
                yield pl.collate(samples)
            if not self.train:
                return
