"""Full-model reference-checkpoint predict-parity fixture (VERDICT r4 #4).

Extends the ME-permutation methodology (test_me_permutation.py) to the whole
detector: a synthetic reference-layout torch state_dict covering ALL three
trainable groups of ``SparseFeatureFusionSingleStage3DDetector``
(sparse_featfusion_single_stage.py:67-75 — 2D torchvision ResNet backbone,
MinkResNet ``backbone_3d``, ``bbox_head`` towers with BN statistics) is
pushed through ``load_reference_detector``, and the converted model's
predict output is checked against an INDEPENDENTLY coded numpy oracle of the
reference predict semantics:

- score compose + per-level nms_pre topk (fcaf3d_head.py:1352-1384),
- 12-dim rot-mat regression decode: ortho-6D Gram-Schmidt -> ZXY euler ->
  rotated face-distance shift (fcaf3d_head.py:1455-1535, ortho_6d_2_Mat
  :1739-1751),
- yaw truncation of 9-DoF boxes before NMS and in the returned predictions
  (fcaf3d_head.py:1681-1683, the published protocol),
- per-class greedy NMS survivors (fcaf3d_head.py:1666-1723).

The oracle shares nothing with ``models/fcaf3d.py``'s decode/NMS code: the
euler extraction, Gram-Schmidt, topk and greedy suppression below are written
from the reference formulas in plain numpy. (Pairwise yaw-box IoU values are
taken from ``geometry.iou.boxes3d_iou``, which is pinned by its own oracle
suite in test_geometry.py — both paths consume identical box sets, so any
decode drift still diverges.) A layout/decode/protocol bug a real published
checkpoint would hit fails this test at tiny scale.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodiedscan_tpu.geometry.iou import boxes3d_iou, boxes7d_to_9d


# ---------------------------------------------------------------- numpy oracle

def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_ortho6d_to_mat(x_raw, y_raw):
    """ortho_6d_2_Mat (fcaf3d_head.py:1739-1751): y normalized first."""

    def norm(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)

    y = norm(y_raw)
    z = norm(np.cross(x_raw, y))
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=-1)  # columns are x, y, z


def _np_mat_to_euler_zxy(r):
    """R = Rz(a) @ Rx(b) @ Ry(c) -> (a, b, c), independent extraction."""
    b = np.arcsin(np.clip(r[..., 2, 1], -1.0, 1.0))
    a = np.arctan2(-r[..., 0, 1], r[..., 1, 1])
    c = np.arctan2(-r[..., 2, 0], r[..., 2, 2])
    return np.stack([a, b, c], -1)


def _np_decode_rotmat(points, reg):
    """_bbox_pred_to_bbox 12-dim branch (fcaf3d_head.py:1504-1535)."""
    rot = _np_ortho6d_to_mat(reg[:, 6:9], reg[:, 9:12])
    euler = _np_mat_to_euler_zxy(rot)
    shift = np.stack([(reg[:, 1] - reg[:, 0]) / 2,
                      (reg[:, 3] - reg[:, 2]) / 2,
                      (reg[:, 5] - reg[:, 4]) / 2], -1)
    # rotation_3d_in_euler (utils.py:33-87): p_rot = p @ R^T
    rot2 = np.stack([_np_euler_zxy_to_mat(e) for e in euler])
    shift = np.einsum('nj,nkj->nk', shift, rot2)
    center = points + shift
    size = np.stack([reg[:, 0] + reg[:, 1], reg[:, 2] + reg[:, 3],
                     reg[:, 4] + reg[:, 5]], -1)
    return np.concatenate([center, size, euler], -1)


def _np_euler_zxy_to_mat(e):
    a, b, c = e
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
    rx = np.array([[1, 0, 0], [0, cb, -sb], [0, sb, cb]])
    ry = np.array([[cc, 0, sc], [0, 1, 0], [-sc, 0, cc]])
    return rz @ rx @ ry


def _yaw_iou_matrix(boxes7):
    """Pairwise yaw-only IoU via the separately-pinned exact kernel."""
    b9 = np.asarray(boxes7d_to_9d(jnp.asarray(boxes7.astype(np.float32))))
    return np.asarray(boxes3d_iou(jnp.asarray(b9), jnp.asarray(b9)))


def oracle_predict_single(center_l, reg_l, cls_l, pts_l, mask_l, nms_pre,
                          score_thr, iou_thr):
    """Reference predict semantics for one scene -> set of detections."""
    mlvl_boxes, mlvl_scores = [], []
    for center, reg, cls, pts, m in zip(center_l, reg_l, cls_l, pts_l,
                                        mask_l):
        scores = _np_sigmoid(cls) * _np_sigmoid(center)[:, None]  # (N, C)
        scores = np.where(m[:, None], scores, 0.0)
        ms = scores.max(1)
        k = min(nms_pre, len(ms))
        ids = np.argsort(-ms, kind='stable')[:k]
        mlvl_boxes.append(_np_decode_rotmat(pts[ids], reg[ids]))
        mlvl_scores.append(scores[ids])
    boxes = np.concatenate(mlvl_boxes)
    scores = np.concatenate(mlvl_scores)
    boxes7 = boxes[:, :7]  # yaw truncation (fcaf3d_head.py:1681-1683)
    iou = _yaw_iou_matrix(boxes7)
    dets = []
    for ci in range(scores.shape[1]):
        ids = np.where(scores[:, ci] > score_thr)[0]
        if not len(ids):
            continue
        order = ids[np.argsort(-scores[ids, ci], kind='stable')]
        keep = []
        for i in order:
            if all(iou[i, j] <= iou_thr for j in keep):
                keep.append(i)
        dets.extend((ci, float(scores[i, ci]), boxes7[i]) for i in keep)
    return dets


# --------------------------------------------------------- state-dict fixture

def full_reference_state_dict():
    """Reference-layout state dict for the tiny detector's three groups."""
    import torch

    from test_convert import (TestFCAFHeadConversion, TestMinkResNetConversion,
                              make_torch_basicblock_resnet18)
    torch.manual_seed(0)
    net2d = make_torch_basicblock_resnet18(base=16)
    for m in net2d.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
    sd = {f'backbone.{k}': v.numpy() * 0.5
          for k, v in net2d.state_dict().items()}
    sd.update({k: v * 0.1 for k, v in
               TestMinkResNetConversion()._fake_me_sd(depth=18).items()})
    head = {k: v * 0.1 for k, v in
            TestFCAFHeadConversion()._fake_head_sd().items()}
    head['bbox_head.conv_cls.bias'] = np.full(5, -2.0)
    sd.update(head)
    return sd


@pytest.mark.compile
class TestFullModelReferencePredictParity:

    @pytest.fixture(scope='class')
    def converted(self):
        import __graft_entry__ as g

        from embodiedscan_tpu.utils.convert_weights import \
            load_reference_detector
        model = dataclasses.replace(g._tiny_model(), max_candidates=1024,
                                    max_dets=640)
        batch = g._tiny_batch(b=2, p=512, g=4)
        variables = jax.jit(lambda r, b: model.init(
            r, b, train=False, mode='feats'))(jax.random.PRNGKey(0), batch)
        sd = full_reference_state_dict()
        variables, loaded, skipped = load_reference_detector(
            variables, sd, mink_depth=18, resnet_depth=18)
        return model, variables, batch, loaded, skipped

    def test_checkpoint_loads_fully(self, converted):
        _, _, _, loaded, skipped = converted
        assert not skipped, skipped[:10]
        # all three groups landed: 2D resnet18 (> 100 leaves incl. BN
        # stats), mink18 (> 80), head (55 — test_convert pins the count)
        assert loaded > 250, loaded

    def test_predict_matches_numpy_oracle(self, converted):
        model, variables, batch, _, _ = converted
        outs = jax.device_get(
            jax.jit(lambda v, b: model.apply(v, b, train=False,
                                             mode='feats'))(variables, batch))
        preds = jax.device_get(
            jax.jit(lambda v, b: model.apply(v, b, train=False,
                                             mode='predict'))(variables,
                                                              batch))
        # tiny-model test cfg (mirrors _tiny_model + FCAF3DHead defaults)
        nms_pre, score_thr, iou_thr = 32, 0.01, 0.5
        b = batch['points'].shape[0]
        for bi in range(b):
            want = oracle_predict_single(
                [np.asarray(c[bi])[..., 0] for c in outs.center],
                [np.asarray(r[bi]) for r in outs.reg],
                [np.asarray(c[bi]) for c in outs.cls],
                [np.asarray(p[bi]) for p in outs.points],
                [np.asarray(m[bi]) for m in outs.masks],
                nms_pre, score_thr, iou_thr)
            keep = np.asarray(preds['mask'][bi])
            got = [(int(preds['labels'][bi][i]),
                    float(preds['scores'][bi][i]),
                    np.asarray(preds['bboxes'][bi][i][:7]))
                   for i in np.where(keep)[0]]
            assert len(got) == len(want), (len(got), len(want))
            key = lambda d: (d[0], -d[1])
            for gd, wd in zip(sorted(got, key=key), sorted(want, key=key)):
                assert gd[0] == wd[0]
                np.testing.assert_allclose(gd[1], wd[1], rtol=1e-4,
                                           atol=1e-6)
                np.testing.assert_allclose(gd[2], wd[2], rtol=1e-3,
                                           atol=1e-4)
