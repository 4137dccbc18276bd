"""Visualization + explorer smoke tests (file outputs, no display)."""

import os

import numpy as np


class TestVis:

    def test_scene_ply(self, tmp_path):
        from embodiedscan_tpu.vis.visualization import export_scene_ply
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0.3, 0, 0]], np.float32)
        out = str(tmp_path / 'scene.ply')
        export_scene_ply(out, pts, boxes, np.array([2]))
        text = open(out).read()
        assert 'element vertex 108' in text  # 100 pts + 8 corners
        assert 'element edge 12' in text

    def test_occupancy_ply(self, tmp_path):
        from embodiedscan_tpu.vis.visualization import export_occupancy_ply
        occ = np.zeros((4, 4, 2), np.int32)
        occ[1, 2, 0] = 3
        occ[0, 0, 1] = 255  # ignored
        out = str(tmp_path / 'occ.ply')
        export_occupancy_ply(out, occ)
        assert 'element vertex 1' in open(out).read()

    def test_draw_boxes_on_image(self):
        from embodiedscan_tpu.vis.visualization import draw_boxes_on_image
        rgb = np.zeros((64, 64, 3), np.uint8)
        k = np.array([[60.0, 0, 32, 0], [0, 60, 32, 0], [0, 0, 1, 0],
                      [0, 0, 0, 1]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[2, 3] = 3.0  # box 3m in front
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0, 0, 0]], np.float32)
        out = draw_boxes_on_image(rgb, boxes, k @ ext, np.array([0]))
        assert out.shape == rgb.shape
        assert out.sum() > 0  # something was drawn

    def test_nms_filter(self):
        from embodiedscan_tpu.vis.visualization import nms_filter
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0, 0, 0],
                          [0.05, 0, 0, 1, 1, 1, 0, 0, 0],
                          [5, 5, 5, 1, 1, 1, 0, 0, 0]], np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        labels = np.array([1, 1, 2])
        fb, fs, fl = nms_filter(boxes, scores, labels, score_thr=0.5,
                                iou_thr=0.3)
        assert len(fb) == 2  # duplicate suppressed


class TestHtmlViewer:
    """Interactive single-file viewer + LineMesh parity (SURVEY §2a #57)."""

    def test_export_scene_html(self, tmp_path):
        from embodiedscan_tpu.vis.html_viewer import export_scene_html
        rng = np.random.RandomState(0)
        pts = rng.randn(500, 3).astype(np.float32)
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0.3, 0, 0],
                          [2, 0, 0, 1, 2, 1, 0, 0, 0]], np.float32)
        out = str(tmp_path / 'scene.html')
        export_scene_html(out, pts, boxes, np.array([1, 3]),
                          class_names=['a', 'b', 'c', 'd'])
        text = open(out).read()
        assert text.startswith('<!DOCTYPE html>')
        assert '"boxes"' in text and '"legend"' in text
        # both class names land in the embedded legend
        assert '"b"' in text and '"d"' in text
        # self-contained: no external scripts or network fetches
        assert 'http' not in text and 'src=' not in text

    def test_export_scene_html_subsamples(self, tmp_path):
        from embodiedscan_tpu.vis.html_viewer import export_scene_html
        pts = np.zeros((5000, 3), np.float32)
        out = str(tmp_path / 'big.html')
        export_scene_html(out, pts, max_points=100)
        import json
        import re
        scene = json.loads(
            re.search(r'const SCENE = (\{.*?\});\n', open(out).read(),
                      re.S).group(1))
        assert len(scene['points']) == 100

    def test_boxes_line_mesh(self, tmp_path):
        from embodiedscan_tpu.vis.html_viewer import (
            export_boxes_line_mesh_ply)
        boxes = np.array([[0, 0, 0, 1, 1, 1, 0.2, 0.1, 0]], np.float32)
        out = str(tmp_path / 'lines.ply')
        export_boxes_line_mesh_ply(out, boxes, np.array([1]))
        text = open(out).read()
        # 12 edges x 8 prism vertices / x 8 triangles
        assert 'element vertex 96' in text
        assert 'element face 96' in text


class TestExplorer:

    def test_explorer_api(self, tmp_path, fake_data):
        from embodiedscan_tpu.explorer import EmbodiedScanExplorer
        exp = EmbodiedScanExplorer(fake_data,
                                   ['embodiedscan_infos_train.pkl'])
        assert exp.count_scenes() == 3
        scenes = exp.list_scenes()
        assert scenes[0].startswith('scannet/')
        info = exp.scene_info(scenes[0])
        assert info['n_images'] == 4 and info['n_instances'] == 2
        ply = exp.render_scene(scenes[0], str(tmp_path / 's.ply'), n_views=2,
                               max_points_per_view=500)
        assert os.path.exists(ply)
        png = exp.show_image(scenes[0], 0, str(tmp_path / 'v.png'))
        assert os.path.exists(png)
