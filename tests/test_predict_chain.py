"""Oracle test of the full predict chain: decode -> NMS -> indoor_eval.

Hand-crafts perfect head outputs (exact face distances + exact 6D rotation
at in-box locations, confident logits) and asserts the chain recovers the
ground truth at mAP 1.0. This is the deterministic complement to the
overfit tests (test_quality): any sign/convention error in
``decode_bbox_mode``, ``nms3d``, score ranking, or the AP matcher fails it
in seconds, with no optimization in the loop.

Reference chain: fcaf3d_head.py:1455-1535 (_bbox_pred_to_bbox),
:1666-1723 (multiclass nms), eval/indoor_eval.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from embodiedscan_tpu.eval.indoor_eval import indoor_eval
from embodiedscan_tpu.geometry.rotations import euler_zxy_to_matrix
from embodiedscan_tpu.models.fcaf3d import FCAF3DHead, HeadOutputs


def _scene(rng, g=4, n_bg=64, num_classes=5, mode='euler9d'):
    """(points, reg, cls, center, mask, gt_boxes, gt_labels) for one scene."""
    centers = rng.uniform(-3, 3, (g, 3)).astype(np.float32)
    sizes = rng.uniform(0.6, 1.5, (g, 3)).astype(np.float32)
    if mode == 'euler9d':
        angles = np.stack([
            rng.uniform(-np.pi, np.pi, g),
            rng.uniform(-0.25, 0.25, g),
            rng.uniform(-0.25, 0.25, g)
        ], -1).astype(np.float32)
    elif mode == 'yaw7d':
        angles = np.stack([
            rng.uniform(-np.pi, np.pi, g),
            np.zeros(g), np.zeros(g)
        ], -1).astype(np.float32)
    else:  # aa6d
        angles = np.zeros((g, 3), np.float32)
    boxes = np.concatenate([centers, sizes, angles], -1)
    labels = rng.randint(0, num_classes, g)

    per = 4  # confident locations per gt
    rot = np.asarray(euler_zxy_to_matrix(jnp.asarray(angles)))  # (g, 3, 3)
    locs = []
    for i in range(g):
        local = rng.uniform(-0.3, 0.3, (per, 3)).astype(np.float32) \
            * sizes[i]
        locs.append(local @ rot[i].T + centers[i])
    pos = np.concatenate(locs)  # (g*per, 3)
    bg = rng.uniform(-4, 4, (n_bg, 3)).astype(np.float32)
    points = np.concatenate([pos, bg]).astype(np.float32)
    p = len(points)

    # exact-decode construction: decode computes center = p + R @ shift
    # with shift = ((d_max - d_min)/2, ...), so build the distances from
    # the TRUE local offset shift = R^T (c - p). (The assigner's
    # ``face_distances`` rotates by -euler like the reference — an
    # approximation of the inverse on tilted boxes that is fine for the
    # inside-test but would not decode back exactly.)
    own = np.repeat(np.arange(g), per)
    shift = np.einsum('pji,pj->pi', rot[own],
                      boxes[own, :3] - points[:g * per])  # R^T (c - p)
    half = sizes[own] / 2
    d_min, d_max = half - shift, half + shift
    assert (d_min > 0).all() and (d_max > 0).all()
    fd_exact = np.stack([d_min[:, 0], d_max[:, 0], d_min[:, 1], d_max[:, 1],
                         d_min[:, 2], d_max[:, 2]], -1)
    reg_dim = {'euler9d': 12, 'yaw7d': 7, 'aa6d': 6}[mode]
    reg = np.zeros((p, reg_dim), np.float32)
    reg[:, :6] = 1.0  # benign distances for background rows
    reg[:g * per, :6] = fd_exact
    if mode == 'euler9d':
        # 6D rotation = first two columns of the gt rotation matrix
        reg[:g * per, 6:9] = rot[own][:, :, 0]
        reg[:g * per, 9:12] = rot[own][:, :, 1]
        reg[g * per:, 6:9] = [1, 0, 0]
        reg[g * per:, 9:12] = [0, 1, 0]
    elif mode == 'yaw7d':
        reg[:g * per, 6] = angles[own, 0]

    cls = np.full((p, num_classes), -8.0, np.float32)
    cls[np.arange(g * per), labels[own]] = 8.0
    center = np.full((p,), -8.0, np.float32)
    center[:g * per] = 8.0
    mask = np.ones((p,), bool)
    return points, reg, cls, center, mask, boxes, labels


@pytest.mark.parametrize('mode,protocol', [
    ('euler9d', 'full9d'), ('euler9d', 'reference'),
    ('yaw7d', 'reference'), ('aa6d', 'reference')])
def test_perfect_outputs_give_perfect_map(mode, protocol):
    rng = np.random.RandomState(0)
    num_classes, b = 5, 2
    scenes = [_scene(rng, mode=mode) for _ in range(b)]
    stack = lambda i: jnp.asarray(np.stack([s[i] for s in scenes]))
    outs = HeadOutputs(center=[stack(3)[..., None]], reg=[stack(1)],
                       cls=[stack(2)], points=[stack(0)], masks=[stack(4)])
    head = FCAF3DHead(num_classes=num_classes, bbox_mode=mode, nms_pre=64,
                      max_candidates=64, max_dets=16, iou_thr=0.5,
                      score_thr=0.01, predict_protocol=protocol)
    preds = {k: np.asarray(v) for k, v in head.predict(outs).items()}

    if mode == 'euler9d' and protocol == 'reference':
        # published protocol: yaw-only predictions — pitch/roll must be
        # exactly zero (fcaf3d_head.py:1681-1683 truncates to [..., :7])
        assert (preds['bboxes'][..., 7:9] == 0).all()

    gts, dts = [], []
    for i, s in enumerate(scenes):
        keep = preds['mask'][i]
        dts.append(dict(bboxes=preds['bboxes'][i][keep],
                        scores=preds['scores'][i][keep],
                        labels=preds['labels'][i][keep]))
        gts.append(dict(gt_boxes=s[5], gt_labels=s[6]))
    metrics = indoor_eval(gts, dts, (0.25, 0.5))
    assert metrics['mAP_0.25'] == pytest.approx(1.0, abs=1e-6), metrics
    if mode == 'euler9d' and protocol == 'reference':
        # yaw-truncated predictions vs tilted (±0.25 rad) GT: exact IoU=1
        # matches are impossible by construction; the chain must still
        # recover every GT at the 0.25 threshold (asserted above) and
        # nearly all at 0.5
        assert metrics['mAP_0.50'] >= 0.7, metrics
    else:
        assert metrics['mAP_0.50'] == pytest.approx(1.0, abs=1e-6), metrics


def test_wrong_labels_fail_eval():
    """Control: shifting every class logit by one label kills the mAP."""
    rng = np.random.RandomState(1)
    s = _scene(rng, mode='euler9d')
    points, reg, cls, center, mask, boxes, labels = s
    cls_shifted = np.roll(cls, 1, axis=-1)
    outs = HeadOutputs(center=[jnp.asarray(center[None, :, None])],
                       reg=[jnp.asarray(reg[None])],
                       cls=[jnp.asarray(cls_shifted[None])],
                       points=[jnp.asarray(points[None])],
                       masks=[jnp.asarray(mask[None])])
    head = FCAF3DHead(num_classes=5, bbox_mode='euler9d', nms_pre=64,
                      max_candidates=64, max_dets=16)
    preds = {k: np.asarray(v) for k, v in head.predict(outs).items()}
    keep = preds['mask'][0]
    dts = [dict(bboxes=preds['bboxes'][0][keep],
                scores=preds['scores'][0][keep],
                labels=preds['labels'][0][keep])]
    gts = [dict(gt_boxes=boxes, gt_labels=labels)]
    metrics = indoor_eval(gts, dts, (0.25,))
    assert metrics['mAP_0.25'] < 0.2, metrics


def test_nms_suppresses_duplicates():
    """All confident locations of one gt collapse to <= a few detections."""
    rng = np.random.RandomState(2)
    s = _scene(rng, g=2, n_bg=16, mode='euler9d')
    points, reg, cls, center, mask, boxes, labels = s
    outs = HeadOutputs(center=[jnp.asarray(center[None, :, None])],
                       reg=[jnp.asarray(reg[None])],
                       cls=[jnp.asarray(cls[None])],
                       points=[jnp.asarray(points[None])],
                       masks=[jnp.asarray(mask[None])])
    head = FCAF3DHead(num_classes=5, bbox_mode='euler9d', nms_pre=64,
                      max_candidates=64, max_dets=16, iou_thr=0.5)
    preds = {k: np.asarray(v) for k, v in head.predict(outs).items()}
    strong = preds['mask'][0] & (preds['scores'][0] > 0.5)
    # 8 confident locations (4 per gt) must NMS down to ~one per gt
    # (distinct labels may survive per gt; bound it loosely)
    assert 2 <= strong.sum() <= 4, preds['scores'][0]
