"""Offline continuous drawers (vis/continuous.py): artifacts + geometry."""

import os

import numpy as np
import pytest

from embodiedscan_tpu.vis import continuous as CV


def _view(seed=0, hw=(24, 24)):
    rng = np.random.RandomState(seed)
    h, w = hw
    depth = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    rgb = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    k = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    ext = np.eye(4)
    ext[:3, 3] = [0.1 * seed, 0, 0]
    return rgb, depth, k, ext


class TestDepthToColoredPoints:

    def test_round_trip_against_pipeline(self):
        from embodiedscan_tpu.data import pipeline as pl
        rgb, depth, k, _ = _view()
        pts, cols = CV.depth_to_colored_points(rgb, depth, k, np.eye(4))
        ref = pl.rgbd_to_points(depth, k)
        assert pts.shape == ref.shape
        np.testing.assert_allclose(pts, ref, atol=1e-4)
        assert cols.shape == (len(pts), 3) and cols.dtype == np.uint8

    def test_max_depth_filter(self):
        rgb, depth, k, _ = _view()
        pts, _ = CV.depth_to_colored_points(rgb, depth, k, np.eye(4),
                                            max_depth=1.0)
        # camera z == depth when cam2global is identity
        assert (pts[:, 2] < 1.0).all()

    def test_cam2global_applied(self):
        rgb, depth, k, _ = _view()
        t = np.eye(4)
        t[:3, 3] = [10.0, 0, 0]
        a, _ = CV.depth_to_colored_points(rgb, depth, k, np.eye(4))
        b, _ = CV.depth_to_colored_points(rgb, depth, k, t)
        np.testing.assert_allclose(b[:, 0] - a[:, 0], 10.0, atol=1e-5)


class TestCategoryColor:

    def test_deterministic_and_distinct(self):
        c1, c2 = CV.category_color(3), CV.category_color(3)
        np.testing.assert_array_equal(c1, c2)
        colors = {tuple(CV.category_color(i)) for i in range(284)}
        assert len(colors) > 200  # well-separated for the 284-class set


class TestSceneWriter:

    def test_playback_artifacts(self, tmp_path):
        pytest.importorskip('PIL')
        out = str(tmp_path / 'det')
        writer = CV.ContinuousSceneWriter(out, downsample=8)
        boxes = np.array([[1.0, 0, 1.5, 0.5, 0.5, 0.5, 0.1, 0, 0],
                          [-1.0, 0, 1.5, 0.5, 0.5, 0.5, 0, 0, 0]])
        for i in range(3):
            rgb, depth, k, ext = _view(i)
            k4 = np.eye(4)
            k4[:3, :3] = k
            writer.add_frame(rgb, depth, k, np.linalg.inv(ext), k4 @ ext,
                             boxes, np.array([1, 2]),
                             visible_ids=[i % 2])
        gif = writer.finish()
        assert os.path.exists(gif)
        for i in range(3):
            assert os.path.exists(os.path.join(out, f'step_{i:03d}.ply'))
        # later frames reveal more boxes (cumulative visibility)
        assert len(writer._boxes) == 2


class TestOccWriter:

    def test_occ_artifacts(self, tmp_path):
        pytest.importorskip('PIL')
        out = str(tmp_path / 'occ')
        writer = CV.ContinuousOccupancyWriter(out, voxel_size=0.2)
        rng = np.random.RandomState(0)
        for i in range(2):
            occ = rng.randint(0, 5, (8, 8, 4)).astype(np.int32)
            occ[0, 0, 0] = 255  # ignore label excluded from the PLY
            writer.add_frame(occ)
        gif = writer.finish()
        assert os.path.exists(gif)
        assert os.path.exists(os.path.join(out, 'occ_000.ply'))
        assert writer._frames[0].shape == (32, 32, 3)


class TestPredictionVideo:

    def test_render_from_synthetic_scan(self, tmp_path):
        pytest.importorskip('PIL')
        from embodiedscan_tpu.data.synthetic import make_scan
        scan = make_scan(seed=0, n_views=2, hw=(32, 32), g=3, num_classes=5)
        preds = dict(bboxes=scan['gt_boxes'],
                     scores=np.array([0.9, 0.1, 0.8]),
                     labels=scan['gt_labels'])
        gif = CV.render_prediction_video(scan, preds, str(tmp_path / 'v'))
        assert gif is not None and os.path.exists(gif)
