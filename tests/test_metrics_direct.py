"""Hand-computed fixtures for ground_eval and occupancy_eval (VERDICT r2 #4).

Every number asserted here is derivable on paper: axis-aligned boxes with
known overlap volumes for grounding (bucket routing, top-10 semantics,
@0.25/@0.5 thresholds per reference grounding_metric.py:70-152), and tiny
voxel grids with counted tp/union for occupancy (per-class IoU, geometry
IoU for class 0, 255 exclusion per occupancy_metric.py:64-115).
"""

import numpy as np

from embodiedscan_tpu.eval.grounding_metric import ground_eval
from embodiedscan_tpu.eval.occupancy_metric import occupancy_eval


def _box(cx, cy, cz, dx=2.0, dy=2.0, dz=2.0):
    return [cx, cy, cz, dx, dy, dz, 0.0, 0.0, 0.0]


def _det(boxes, scores):
    return dict(bboxes=np.asarray(boxes, np.float32),
                scores=np.asarray(scores, np.float32))


def test_ground_eval_bucket_routing():
    # sample A: exact hit; flags hard/view-dep/unique
    # sample B: zero-overlap miss; complementary flags
    gts = [
        dict(gt_boxes=np.asarray([_box(0, 0, 0)], np.float32),
             is_hard=True, is_view_dep=True, is_unique=True),
        dict(gt_boxes=np.asarray([_box(0, 0, 0)], np.float32),
             is_hard=False, is_view_dep=False, is_unique=False),
    ]
    dts = [
        _det([_box(0, 0, 0)], [1.0]),
        _det([_box(100, 100, 100)], [1.0]),
    ]
    res = ground_eval(gts, dts)
    # counts seed at 1e-14 (reference grounding_metric.py:85), so exact
    # ratios land within 1e-13 of the hand value
    for t in ('0.25', '0.5'):
        np.testing.assert_allclose(res[f'Hard@{t}'], 1.0)
        np.testing.assert_allclose(res[f'View-Dep@{t}'], 1.0)
        np.testing.assert_allclose(res[f'Unique@{t}'], 1.0)
        assert res[f'Easy@{t}'] == 0.0
        assert res[f'View-Indep@{t}'] == 0.0
        assert res[f'Multi@{t}'] == 0.0
        np.testing.assert_allclose(res[f'Overall@{t}'], 0.5)


def test_ground_eval_iou_thresholds():
    # pred shifted +1 in x vs a 2x2x2 gt: inter 1*2*2=4, union 8+8-4=12,
    # IoU = 1/3 -> counts at 0.25, not at 0.5
    gts = [dict(gt_boxes=np.asarray([_box(0, 0, 0)], np.float32),
                is_hard=False, is_view_dep=False, is_unique=False)]
    dts = [_det([_box(1.0, 0, 0)], [1.0])]
    res = ground_eval(gts, dts)
    np.testing.assert_allclose(res['Overall@0.25'], 1.0)
    assert res['Overall@0.5'] == 0.0


def test_ground_eval_top10_semantics():
    # the only correct box ranks 11th by score -> not found; at rank 10
    # (after removing one distractor) -> found. Reference takes
    # argsort(descending)[:10] (grounding_metric.py:103).
    gt = dict(gt_boxes=np.asarray([_box(0, 0, 0)], np.float32),
              is_hard=False, is_view_dep=False, is_unique=False)
    distractors = [_box(50 + 5 * i, 50, 50) for i in range(10)]
    boxes11 = distractors + [_box(0, 0, 0)]
    scores11 = [1.0 - 0.01 * i for i in range(10)] + [0.5]
    res = ground_eval([gt], [_det(boxes11, scores11)])
    assert res['Overall@0.25'] == 0.0

    boxes10 = distractors[:9] + [_box(0, 0, 0)]
    scores10 = [1.0 - 0.01 * i for i in range(9)] + [0.5]
    res = ground_eval([gt], [_det(boxes10, scores10)])
    np.testing.assert_allclose(res['Overall@0.25'], 1.0)


def test_ground_eval_multi_target_any_gt_counts():
    # two gt boxes; prediction hits only the second -> found (iou.any())
    gt = dict(gt_boxes=np.asarray([_box(0, 0, 0), _box(10, 0, 0)],
                                  np.float32),
              is_hard=False, is_view_dep=False, is_unique=False)
    res = ground_eval([gt], [_det([_box(10, 0, 0)], [1.0])])
    np.testing.assert_allclose(res['Overall@0.5'], 1.0)


def test_occupancy_eval_hand_counts():
    # 2x2x1 grid, 3 classes (0 empty, 1, 2).
    # gt:   [[1, 2], [0, 255]]   pred: [[1, 1], [2, 0]]
    # valid voxels (gt != 255): (0,0)=1/1, (0,1)=2/1, (1,0)=0/2
    # class 1: tp=1, gt=1, pred=2 -> union 2 -> IoU 0.5
    # class 2: tp=0, gt=1, pred=1 -> union 2 -> IoU 0.0
    # class 0 geometry (occupied = label != 0):
    #   gt occupied {(0,0),(0,1)}, pred occupied {(0,0),(0,1),(1,0)}
    #   tp=2, union 2+3-2=3 -> IoU 2/3
    gt = np.array([[[1], [2]], [[0], [255]]])
    pr = np.array([[[1], [1]], [[2], [0]]])
    res = occupancy_eval([gt], [pr], num_classes=3)
    assert res['empty'] == 2.0 / 3.0
    assert res['1'] == 0.5
    assert res['2'] == 0.0
    np.testing.assert_allclose(res['mIoU'], (2 / 3 + 0.5 + 0.0) / 3)


def test_occupancy_eval_255_exclusion():
    # the 255 voxel disagrees wildly; excluding it makes everything perfect
    gt = np.array([[[1], [255]]])
    pr = np.array([[[1], [2]]])
    res = occupancy_eval([gt], [pr], num_classes=3)
    assert res['1'] == 1.0
    assert res['empty'] == 1.0
    # class 2 never appears among valid voxels -> union 0 -> excluded
    assert '2' not in res
    assert res['mIoU'] == 1.0


def test_occupancy_eval_accumulates_across_scenes():
    # two scenes pooled BEFORE the division (reference accumulates score
    # then divides): scene1 class1 tp=1/union=1, scene2 tp=0/union=1
    # -> pooled IoU = 1/2 (not mean of per-scene 1.0 and 0.0 computed
    # separately... which happens to also be 0.5; use asymmetric counts)
    g1 = np.array([[[1, 1]]])  # two voxels class 1
    p1 = np.array([[[1, 1]]])
    g2 = np.array([[[1, 0]]])
    p2 = np.array([[[0, 0]]])
    # pooled class 1: tp=2, gt=3, pred=2 -> union 3 -> 2/3
    res = occupancy_eval([g1, g2], [p1, p2], num_classes=2)
    np.testing.assert_allclose(res['1'], 2.0 / 3.0)


def test_occupancy_eval_class_names():
    gt = np.array([[[1]]])
    pr = np.array([[[1]]])
    res = occupancy_eval([gt], [pr], num_classes=2, class_names=['wall'])
    assert res['wall'] == 1.0


# ---------------------------------------------------------------------------
# indoor_eval_2d (Indoor2DMetric analog, det_metric.py:165-239)

def test_iou_2d_hand_values():
    from embodiedscan_tpu.eval.indoor_eval2d import iou_2d
    p = np.array([[0, 0, 2, 2], [0, 0, 1, 1]], np.float32)
    g = np.array([[1, 1, 3, 3]], np.float32)
    got = iou_2d(p, g)
    # [0,0,2,2] vs [1,1,3,3]: inter 1, union 4+4-1=7
    np.testing.assert_allclose(got[:, 0], [1 / 7, 0.0], atol=1e-6)
    assert iou_2d(np.zeros((0, 4)), g).shape == (0, 1)


def test_indoor_eval_2d_perfect_and_miss():
    from embodiedscan_tpu.eval.indoor_eval2d import indoor_eval_2d
    gts = [dict(gt_bboxes=np.array([[0, 0, 2, 2], [5, 5, 6, 6]], np.float32),
                gt_labels=np.array([0, 1]))]
    # class 0 matched exactly, class 1 detection misses (IoU 0)
    dts = [dict(bboxes=np.array([[0, 0, 2, 2], [8, 8, 9, 9]], np.float32),
                scores=np.array([0.9, 0.8], np.float32),
                labels=np.array([0, 1]))]
    res = indoor_eval_2d(gts, dts, (0.5,), verbose=False)
    assert res['0_AP_0.50'] == 1.0
    assert res['1_AP_0.50'] == 0.0
    np.testing.assert_allclose(res['mAP_0.50'], 0.5)


def test_indoor_eval_2d_duplicate_is_fp():
    from embodiedscan_tpu.eval.indoor_eval2d import indoor_eval_2d
    gts = [dict(gt_bboxes=np.array([[0, 0, 2, 2]], np.float32),
                gt_labels=np.array([0]))]
    dts = [dict(bboxes=np.array([[0, 0, 2, 2], [0, 0, 2, 2]], np.float32),
                scores=np.array([0.9, 0.8], np.float32),
                labels=np.array([0, 0]))]
    res = indoor_eval_2d(gts, dts, (0.5,), verbose=False)
    # greedy matching: the second (lower-score) duplicate is a false
    # positive but precision at the first detection is already 1.0 -> AP 1
    assert res['0_AP_0.50'] == 1.0
    assert res['0_rec_0.50'] == 1.0
