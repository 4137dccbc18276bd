"""Box/point coordinate-mode conversion tests (geometry/modes.py).

Oracles: the reference's explicit matrices and yaw remaps
(box_3d_mode.py:123-244, coord_3d_mode.py:218-233) hand-evaluated, plus
frame-independence invariants (corners of a converted euler box == the
rigid transform of the source corners).
"""

import numpy as np

from embodiedscan_tpu.geometry import modes as M
from embodiedscan_tpu.geometry.np_boxes import corners_np


class TestPoints:

    def test_depth_to_cam_known(self):
        pts = np.array([[1.0, 2.0, 3.0, 0.5]])  # xyz + passthrough col
        out = M.convert_points(pts, M.DEPTH, M.CAM)
        # [[1,0,0],[0,0,-1],[0,1,0]] @ (1,2,3) = (1,-3,2)
        np.testing.assert_allclose(out, [[1.0, -3.0, 2.0, 0.5]])

    def test_round_trips(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(32, 6).astype(np.float64)
        for a, b in ((M.LIDAR, M.CAM), (M.DEPTH, M.CAM), (M.LIDAR, M.DEPTH)):
            there = M.convert_points(pts, a, b)
            back = M.convert_points(there, b, a)
            np.testing.assert_allclose(back, pts, atol=1e-12)

    def test_custom_rt_4x4(self):
        rt = np.eye(4)
        rt[:3, 3] = [1.0, 2.0, 3.0]
        out = M.convert_points(np.zeros((1, 3)), M.DEPTH, M.DEPTH, rt_mat=rt)
        np.testing.assert_allclose(out, [[1.0, 2.0, 3.0]])


class TestYawBoxes:

    def test_depth_to_cam_known(self):
        box = np.array([[1.0, 2.0, 3.0, 0.4, 0.5, 0.6, 0.3]])
        out = M.convert_boxes(box, M.DEPTH, M.CAM)
        # center (1,-3,2); sizes (dx,dz,dy)=(0.4,0.6,0.5); yaw -> -yaw
        np.testing.assert_allclose(
            out, [[1.0, -3.0, 2.0, 0.4, 0.6, 0.5, -0.3]], atol=1e-12)

    def test_lidar_to_depth_known(self):
        box = np.array([[1.0, 2.0, 3.0, 0.4, 0.5, 0.6, 0.3]])
        out = M.convert_boxes(box, M.LIDAR, M.DEPTH)
        # [[0,-1,0],[1,0,0],[0,0,1]] @ (1,2,3) = (-2,1,3); sizes unchanged;
        # yaw -> yaw + pi/2 wrapped
        np.testing.assert_allclose(
            out, [[-2.0, 1.0, 3.0, 0.4, 0.5, 0.6, 0.3 + np.pi / 2]],
            atol=1e-12)

    def test_round_trip(self):
        rng = np.random.RandomState(1)
        boxes = np.concatenate([
            rng.randn(16, 3),
            rng.uniform(0.2, 2.0, (16, 3)),
            rng.uniform(-np.pi / 2, np.pi / 2, (16, 1))
        ], -1)
        for a, b in ((M.DEPTH, M.CAM), (M.LIDAR, M.DEPTH)):
            back = M.convert_boxes(M.convert_boxes(boxes, a, b), b, a)
            np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-12)
            dyaw = M.limit_period(back[:, 6] - boxes[:, 6], period=2 * np.pi)
            np.testing.assert_allclose(dyaw, 0, atol=1e-12)

    def test_correct_yaw_matches_vector_rotation(self):
        """correct_yaw rotates the heading vector through rt_mat
        (box_3d_mode.py:131-138, 236-244)."""
        box = np.array([[0.0, 0, 0, 1, 1, 1, 0.7]])
        out = M.convert_boxes(box, M.DEPTH, M.CAM, correct_yaw=True)
        # depth heading (cos .7, sin .7, 0) -> cam = (cos, 0, sin);
        # cam yaw = atan2(-v_z, v_x) = -0.7
        np.testing.assert_allclose(out[0, 6], -0.7, atol=1e-12)

    def test_passthrough_columns(self):
        box = np.array([[0.0, 0, 0, 1, 1, 1, 0.0, 42.0]])
        out = M.convert_boxes(box, M.DEPTH, M.CAM)
        assert out.shape == (1, 8) and out[0, 7] == 42.0


class TestEulerBoxes:

    def _rand(self, n=24, seed=2):
        rng = np.random.RandomState(seed)
        return np.concatenate([
            rng.randn(n, 3),
            rng.uniform(0.2, 2.0, (n, 3)),
            rng.uniform(-np.pi, np.pi, (n, 1)),
            rng.uniform(-1.2, 1.2, (n, 2)),
        ], -1)

    def test_corners_transform_invariant(self):
        """Corners of the converted box == rigid transform of src corners."""
        boxes = self._rand()
        for a, b in ((M.DEPTH, M.CAM), (M.CAM, M.DEPTH), (M.LIDAR, M.CAM)):
            rt = np.asarray(M._RT[(a, b)], np.float64)
            out = M.convert_euler_boxes(boxes, a, b)
            want = corners_np(boxes) @ rt.T
            got = corners_np(out)
            # corner ORDER may permute within a box (euler decomposition is
            # frame-relative); compare as sets via pairwise min-distance
            d = np.linalg.norm(got[:, :, None] - want[:, None], axis=-1)
            assert d.min(-1).max() < 1e-5
            assert d.min(-2).max() < 1e-5

    def test_round_trip(self):
        boxes = self._rand(seed=3)
        back = M.convert_euler_boxes(
            M.convert_euler_boxes(boxes, M.DEPTH, M.CAM), M.CAM, M.DEPTH)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-10)
        # angles may differ by equivalent euler decompositions; corners match
        np.testing.assert_allclose(corners_np(back), corners_np(boxes),
                                   atol=1e-8)

    def test_cam_boxes_to_depth_with_extrinsic(self):
        """Full 4x4 cam2global: corners must follow the rigid transform."""
        rng = np.random.RandomState(4)
        # random rigid transform
        q = np.linalg.qr(rng.randn(3, 3))[0]
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = np.eye(4)
        t[:3, :3] = q
        t[:3, 3] = rng.randn(3)
        boxes = self._rand(seed=5)
        out = M.cam_boxes_to_depth(boxes, t)
        want = corners_np(boxes) @ q.T + t[:3, 3]
        d = np.linalg.norm(corners_np(out)[:, :, None] - want[:, None],
                           axis=-1)
        assert d.min(-1).max() < 1e-5

    def test_gimbal_edge(self):
        """beta = +-pi/2 (gimbal lock) stays finite and volume-preserving."""
        boxes = np.array([[0.0, 0, 0, 1, 2, 3, 0.3, np.pi / 2, -0.2]])
        out = M.convert_euler_boxes(boxes, M.DEPTH, M.CAM)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, 3:6], boxes[0, 3:6])
