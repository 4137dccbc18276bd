"""Point-container op tests (geometry/points_ops.py) vs hand oracles."""

import numpy as np

from embodiedscan_tpu.geometry import points_ops as P
from embodiedscan_tpu.geometry.modes import CAM, DEPTH, LIDAR


class TestRotate:

    def test_depth_rotation_axis_z(self):
        pts = np.array([[1.0, 0.0, 5.0, 9.0]])
        out, rot_t = P.rotate(pts, np.pi / 2, mode=DEPTH)
        np.testing.assert_allclose(out[0, :3], [0, 1, 5], atol=1e-12)
        assert out[0, 3] == 9.0  # passthrough column
        # xyz_new == xyz @ rot_t contract
        np.testing.assert_allclose(pts[:, :3] @ rot_t, out[:, :3])

    def test_cam_rotation_axis_y(self):
        pts = np.array([[1.0, 7.0, 0.0]])
        out, _ = P.rotate(pts, np.pi / 2, mode=CAM)
        # y-axis rotation keeps y, maps x->(cos, -sin) plane per the
        # reference's axis=1 sign convention (utils.py:90-160)
        np.testing.assert_allclose(out[0, 1], 7.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.norm(out[0, ::2]), 1.0,
                                   atol=1e-12)

    def test_matrix_rotation(self):
        rng = np.random.RandomState(0)
        q = np.linalg.qr(rng.randn(3, 3))[0]
        pts = rng.randn(8, 5)
        out, rot_t = P.rotate(pts, q)
        np.testing.assert_allclose(out[:, :3], pts[:, :3] @ q)
        np.testing.assert_allclose(rot_t, q)


class TestFlip:

    def test_per_mode_columns(self):
        pts = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(
            P.flip(pts, 'horizontal', DEPTH), [[-1, 2, 3]])
        np.testing.assert_allclose(
            P.flip(pts, 'vertical', DEPTH), [[1, -2, 3]])
        np.testing.assert_allclose(
            P.flip(pts, 'vertical', CAM), [[1, 2, -3]])
        np.testing.assert_allclose(
            P.flip(pts, 'horizontal', LIDAR), [[1, -2, 3]])


class TestRanges:

    def test_in_range_3d(self):
        pts = np.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [0.0, 0, 0]])
        m = P.in_range_3d(pts, (0, 0, 0, 1, 1, 1))
        np.testing.assert_array_equal(m, [True, False, False])

    def test_bev_modes(self):
        pts = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(P.bev(pts, DEPTH), [[1, 2]])
        np.testing.assert_allclose(P.bev(pts, CAM), [[1, 3]])

    def test_in_range_bev(self):
        pts = np.array([[0.5, 0.5, 99.0], [5.0, 0.5, 0.0]])
        m = P.in_range_bev(pts, (0, 0, 1, 1), DEPTH)
        np.testing.assert_array_equal(m, [True, False])


class TestMisc:

    def test_translate_scale_shuffle(self):
        pts = np.arange(12, dtype=np.float64).reshape(4, 3)
        np.testing.assert_allclose(
            P.translate(pts, [1, 1, 1])[:, :3], pts + 1)
        np.testing.assert_allclose(P.scale(pts, 2.0), pts * 2)
        sh = P.shuffle(pts, np.random.RandomState(0))
        assert sorted(map(tuple, sh.tolist())) == \
            sorted(map(tuple, pts.tolist()))

    def test_convert_to(self):
        pts = np.array([[1.0, 2.0, 3.0]])
        out = P.convert_to(pts, DEPTH, CAM)
        np.testing.assert_allclose(out, [[1.0, -3.0, 2.0]])
