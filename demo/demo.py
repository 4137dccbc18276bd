#!/usr/bin/env python
"""In-the-wild inference demo (reference demo/demo.py:22-281).

Runs multi-view 3D detection on a raw scan directory laid out as:
    <dir>/poses.txt            # per-line: name tx ty tz qx qy qz qw  (or 4x4)
    <dir>/intrinsic.txt        # 4x4 or 3x3 camera intrinsic
    <dir>/rgb/<name>.jpg  <dir>/depth/<name>.png

Usage:
    python demo/demo.py --dir demo/sample --work-dir work_dirs/mv_det3d \
        [--platform cpu] [--out out.ply]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, '.')


def quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def load_scan_dir(path, n_views, image_hw, depth_shift=1000.0):
    from PIL import Image

    from embodiedscan_tpu.data import pipeline as pl
    intrinsic = np.loadtxt(os.path.join(path, 'intrinsic.txt'),
                           dtype=np.float32)
    views = []
    with open(os.path.join(path, 'poses.txt')) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            name = parts[0]
            vals = np.asarray([float(v) for v in parts[1:]])
            cam2global = np.eye(4)
            if len(vals) == 7:
                cam2global[:3, :3] = quat_to_mat(vals[3:])
                cam2global[:3, 3] = vals[:3]
            else:
                cam2global = vals.reshape(4, 4)
            views.append((name, cam2global))
    views = views[:n_views]
    h, w = image_hw
    samples = []
    for name, cam2global in views:
        rgb = Image.open(os.path.join(path, 'rgb', name + '.jpg')).convert(
            'RGB')
        w0, h0 = rgb.size
        rgb = np.asarray(rgb.resize((w, h)), np.uint8)
        depth = np.asarray(
            Image.open(os.path.join(path, 'depth', name + '.png')),
            np.float32) / depth_shift
        k = np.eye(4, dtype=np.float32)
        k[:intrinsic.shape[0], :intrinsic.shape[1]] = intrinsic
        k_scaled = k.copy()
        k_scaled[:3] = np.diag([w / w0, h / h0, 1.0]).astype(
            np.float32) @ k[:3]
        samples.append(
            dict(rgb=rgb, depth=depth, intrinsic=k_scaled,
                 depth_intrinsic=k,
                 extrinsic=np.linalg.inv(cam2global).astype(np.float32)))
    return samples


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dir', required=True)
    parser.add_argument('--work-dir', default='work_dirs/mv_det3d')
    parser.add_argument('--out', default='demo_out.ply')
    parser.add_argument('--platform', default='')
    parser.add_argument('--n-views', type=int, default=10)
    parser.add_argument('overrides', nargs='*')
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from embodiedscan_tpu.configs.base import PRESETS, apply_overrides
    from embodiedscan_tpu.data import pipeline as pl
    from embodiedscan_tpu.train.loop import evaluate, init_model
    from embodiedscan_tpu.vis.visualization import (export_scene_ply,
                                                    nms_filter)
    cfg = PRESETS['mv_det3d']()
    apply_overrides(cfg, args.overrides)
    cfg.work_dir = args.work_dir

    rng = np.random.RandomState(0)
    views = load_scan_dir(args.dir, args.n_views, tuple(cfg.data.image_hw))
    pts_list, exts, ks, imgs = [], [], [], []
    for v in views:
        pts = pl.rgbd_to_points(v['depth'], v['depth_intrinsic'])
        pts_list.append(pl.point_sample(pts, cfg.data.points_per_view, rng))
        exts.append(v['extrinsic'])
        ks.append(v['intrinsic'])
        imgs.append(pl.normalize_imgs(v['rgb'][None])[0])
    points = pl.aggregate_points(pts_list, exts)
    sample = pl.pack_sample(points, np.stack(imgs), ks, exts,
                            np.zeros((0, 9), np.float32),
                            np.zeros((0,), np.int64), None, cfg.data.n_points,
                            cfg.data.max_boxes, rng)
    batch = pl.collate([sample])

    import jax
    model, variables = init_model(cfg, batch)
    from embodiedscan_tpu.train.checkpoint import CheckpointManager
    from embodiedscan_tpu.train.loop import lr_mult_fn_for
    from embodiedscan_tpu.train.state import (create_train_state,
                                              make_optimizer, multistep_lr)
    ckpt = CheckpointManager(cfg.work_dir)
    tx = make_optimizer(multistep_lr(cfg.schedule.lr, 100),
                        lr_mult_fn=lr_mult_fn_for(cfg.model.task),
                        params_template=variables['params'])
    restored = ckpt.restore(create_train_state(model, variables, tx))
    if restored is not None:
        variables = {'params': restored.params,
                     'batch_stats': restored.batch_stats}
        print(f'loaded checkpoint step {int(restored.step)}')
    preds = jax.device_get(
        model.apply(variables, batch, train=False, mode='predict'))
    keep = preds['mask'][0]
    boxes, scores, labels = nms_filter(preds['bboxes'][0][keep],
                                       preds['scores'][0][keep],
                                       preds['labels'][0][keep])
    print(f'{len(boxes)} detections after filtering')
    export_scene_ply(args.out, points, boxes, labels)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
