"""Known-value tests for the AP/AR evaluation engine."""

import numpy as np

from embodiedscan_tpu.eval.indoor_eval import average_precision, indoor_eval


def box(x, y, z, s=1.0):
    return [x, y, z, s, s, s, 0.0, 0.0, 0.0]


class TestAveragePrecision:

    def test_perfect(self):
        r = np.array([0.5, 1.0])
        p = np.array([1.0, 1.0])
        assert average_precision(r, p)[0] == 1.0

    def test_half(self):
        r = np.array([0.5, 0.5])
        p = np.array([1.0, 0.5])
        np.testing.assert_allclose(average_precision(r, p)[0], 0.5, atol=1e-6)


class TestIndoorEval:

    def test_perfect_detection(self):
        gts = [dict(gt_boxes=np.array([box(0, 0, 0), box(5, 5, 5)]),
                    gt_labels=np.array([0, 1]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0), box(5, 5, 5)]),
                    scores=np.array([0.9, 0.8]),
                    labels=np.array([0, 1]))]
        ret = indoor_eval(gts, dts, (0.25, 0.5), verbose=False)
        assert ret['mAP_0.25'] == 1.0
        assert ret['mAR_0.50'] == 1.0

    def test_one_miss(self):
        # 2 gts of one class, only 1 detected -> AP = AR = 0.5
        gts = [dict(gt_boxes=np.array([box(0, 0, 0), box(5, 5, 5)]),
                    gt_labels=np.array([0, 0]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0)]),
                    scores=np.array([0.9]), labels=np.array([0]))]
        ret = indoor_eval(gts, dts, (0.25,), verbose=False)
        np.testing.assert_allclose(ret['mAP_0.25'], 0.5, atol=1e-6)
        np.testing.assert_allclose(ret['mAR_0.25'], 0.5, atol=1e-6)

    def test_low_score_fp_keeps_ap(self):
        # FP ranked below the TP does not reduce area-AP
        gts = [dict(gt_boxes=np.array([box(0, 0, 0)]),
                    gt_labels=np.array([0]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0), box(9, 9, 9)]),
                    scores=np.array([0.9, 0.1]), labels=np.array([0, 0]))]
        ret = indoor_eval(gts, dts, (0.25,), verbose=False)
        np.testing.assert_allclose(ret['mAP_0.25'], 1.0, atol=1e-6)

    def test_duplicate_detection_is_fp(self):
        # two dets on the same gt: second is FP, AP stays 1 but precision drops
        gts = [dict(gt_boxes=np.array([box(0, 0, 0)]),
                    gt_labels=np.array([0]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0), box(0.05, 0, 0)]),
                    scores=np.array([0.9, 0.8]), labels=np.array([0, 0]))]
        ret = indoor_eval(gts, dts, (0.25,), verbose=False)
        np.testing.assert_allclose(ret['mAP_0.25'], 1.0, atol=1e-6)

    def test_class_without_gt_dropped(self):
        # predictions of a class that has no gt anywhere are dropped (NaN AP)
        gts = [dict(gt_boxes=np.array([box(0, 0, 0)]),
                    gt_labels=np.array([0]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0), box(5, 5, 5)]),
                    scores=np.array([0.9, 0.95]), labels=np.array([0, 7]))]
        ret = indoor_eval(gts, dts, (0.25,), verbose=False)
        np.testing.assert_allclose(ret['mAP_0.25'], 1.0, atol=1e-6)
        assert '7_AP_0.25' not in ret

    def test_tiny_box_clamped_not_crashing(self):
        gts = [dict(gt_boxes=np.array([box(0, 0, 0)]),
                    gt_labels=np.array([0]))]
        dts = [dict(bboxes=np.array([[0, 0, 0, 1e-6, 1e-6, 1e-6, 0, 0, 0]]),
                    scores=np.array([0.9]), labels=np.array([0]))]
        ret = indoor_eval(gts, dts, (0.25,), verbose=False)
        assert np.isfinite(ret['mAP_0.25'])

    def test_splits(self):
        gts = [dict(gt_boxes=np.array([box(0, 0, 0), box(5, 5, 5)]),
                    gt_labels=np.array([0, 1]))]
        dts = [dict(bboxes=np.array([box(0, 0, 0)]),
                    scores=np.array([0.9]), labels=np.array([0]))]
        ret = indoor_eval(gts, dts, (0.25,), classes_split=([0], [1], []),
                          verbose=False)
        assert ret['head_mAP_0.25'] == 1.0
        assert ret['common_mAP_0.25'] == 0.0


def test_grounding_format_results(tmp_path):
    from embodiedscan_tpu.eval.grounding_metric import format_results
    rng = np.random.RandomState(0)
    dts = [dict(bboxes=rng.randn(32, 9), scores=rng.rand(32))
           for _ in range(3)]
    out = format_results(dts, str(tmp_path))
    import json
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 3
    for r in results:
        assert len(r['bboxes_3d']) == 20
        scores = r['scores_3d']
        assert scores == sorted(scores, reverse=True)


def test_per_class_table():
    """Reference-style per-class table renders names and overall row."""
    from embodiedscan_tpu.eval.indoor_eval import indoor_eval, per_class_table
    boxes = np.concatenate([np.zeros((2, 3)), np.full((2, 3), 1.0),
                            np.zeros((2, 3))], -1)
    gts = [dict(gt_boxes=boxes, gt_labels=np.array([0, 1]))]
    dts = [dict(bboxes=boxes, scores=np.array([0.9, 0.8]),
                labels=np.array([0, 1]))]
    l2c = {0: 'chair', 1: 'table'}
    ret = indoor_eval(gts, dts, (0.25,), label2cat=l2c, verbose=False)
    table = per_class_table(ret, [0, 1], (0.25,), l2c)
    assert 'chair' in table and 'table' in table and 'Overall' in table
    assert '1.0000' in table
    # all rows align to the same width
    widths = {len(line) for line in table.splitlines()}
    assert len(widths) == 1
