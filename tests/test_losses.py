"""Loss oracle tests (focal, BCE, chamfer, IoU losses)."""

import numpy as np

import jax
import jax.numpy as jnp

from embodiedscan_tpu.models import losses as L


class TestLosses:

    def test_focal_all_background(self):
        logits = jnp.full((4, 3), -10.0)
        labels = jnp.full((4,), -1)
        out = L.sigmoid_focal_loss(logits, labels, jnp.ones(4, bool), 3,
                                   jnp.asarray(1.0))
        assert float(out) < 1e-3

    def test_focal_matches_manual(self):
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
        labels = jnp.asarray(rng.randint(-1, 5, 8))
        valid = jnp.ones(8, bool)
        got = float(L.sigmoid_focal_loss(logits, labels, valid, 5,
                                         jnp.asarray(3.0)))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        onehot = np.zeros((8, 5))
        for i, lab in enumerate(np.asarray(labels)):
            if lab >= 0:
                onehot[i, lab] = 1
        pt = np.where(onehot > 0, p, 1 - p)
        at = np.where(onehot > 0, 0.25, 0.75)
        want = (at * (1 - pt)**2 * -np.log(np.clip(pt, 1e-12, None))).sum() / 3
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_bbox_cd_identical_boxes_zero(self):
        boxes = jnp.asarray([[1.0, 2, 3, 1, 2, 1, 0.3, 0.1, -0.2]])
        out = L.bbox_cd_loss(boxes, boxes, jnp.ones(1, bool))
        assert float(out) < 1e-5

    def test_bbox_cd_center_shift(self):
        a = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0, 0, 0]])
        b = jnp.asarray([[10.0, 0, 0, 1, 1, 1, 0, 0, 0]])
        # every corner is >= 9 away in x alone -> mean l1 distance >= 9
        out = L.bbox_cd_loss(a, b, jnp.ones(1, bool), mode='l1')
        assert float(out) >= 9.0

    def test_rotated_iou_loss(self):
        a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.3, 0, 0]])
        valid = jnp.ones(1, bool)
        assert float(L.rotated_iou_loss(a, a, valid)) < 1e-3
        b = jnp.asarray([[10.0, 0, 0, 2, 2, 2, 0.0, 0, 0]])
        np.testing.assert_allclose(float(L.rotated_iou_loss(a, b, valid)),
                                   1.0, atol=1e-5)
        # differentiable
        g = jax.grad(lambda x: L.rotated_iou_loss(x, a, valid))(
            jnp.asarray([[0.5, 0, 0, 2, 2, 2, 0.1, 0, 0]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_axis_aligned_iou_loss(self):
        a = jnp.asarray([[0.0, 0, 0, 2, 2, 2]])
        assert float(L.axis_aligned_iou_loss(a, a, jnp.ones(1, bool))) < 1e-6

    def test_cross_entropy_ignore(self):
        logits = jnp.asarray([[[10.0, 0, 0], [0, 10.0, 0]]])
        labels = jnp.asarray([[0, 255]])
        out = L.cross_entropy_ignore(logits, labels)
        assert float(out) < 1e-3  # only the confident non-ignored cell counts
