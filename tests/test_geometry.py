"""Oracle tests for the geometry core (rotations, boxes, projection, IoU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodiedscan_tpu.geometry import boxes as B
from embodiedscan_tpu.geometry import iou as IOU
from embodiedscan_tpu.geometry import projection as P
from embodiedscan_tpu.geometry import rotations as R


def np_rx(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def np_ry(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def np_rz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def np_euler_zxy(angles):
    return np_rz(angles[0]) @ np_rx(angles[1]) @ np_ry(angles[2])


class TestRotations:

    def test_euler_to_matrix_matches_composition(self):
        rng = np.random.RandomState(0)
        angles = rng.uniform(-np.pi, np.pi, size=(16, 3)).astype(np.float32)
        got = np.asarray(R.euler_zxy_to_matrix(jnp.asarray(angles)))
        for i in range(16):
            want = np_euler_zxy(angles[i])
            np.testing.assert_allclose(got[i], want, atol=1e-5)

    def test_matrix_to_euler_roundtrip(self):
        rng = np.random.RandomState(1)
        # keep beta (X, asin slot) away from gimbal lock
        angles = np.stack([
            rng.uniform(-np.pi, np.pi, 64),
            rng.uniform(-1.2, 1.2, 64),
            rng.uniform(-np.pi, np.pi, 64),
        ], -1).astype(np.float32)
        mats = R.euler_zxy_to_matrix(jnp.asarray(angles))
        back = np.asarray(R.matrix_to_euler_zxy(mats))
        np.testing.assert_allclose(back, angles, atol=1e-4)

    def test_rotation_3d_in_euler_is_transpose_apply(self):
        rng = np.random.RandomState(2)
        pts = rng.randn(4, 5, 3).astype(np.float32)
        ang = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
        got = np.asarray(R.rotation_3d_in_euler(jnp.asarray(pts), jnp.asarray(ang)))
        for i in range(4):
            want = pts[i] @ np_euler_zxy(ang[i]).T
            np.testing.assert_allclose(got[i], want, atol=1e-5)

    def test_rotation_in_axis_z(self):
        pts = jnp.asarray([[[1.0, 0.0, 0.0]]])
        got = R.rotation_3d_in_axis(pts, jnp.asarray([np.pi / 2]), axis=2)
        np.testing.assert_allclose(np.asarray(got)[0, 0], [0, 1, 0], atol=1e-6)

    def test_ortho_6d_identity(self):
        x = jnp.asarray([[1.0, 0, 0]])
        y = jnp.asarray([[0.0, 1, 0]])
        m = np.asarray(R.ortho_6d_to_matrix(x, y))
        np.testing.assert_allclose(m[0], np.eye(3), atol=1e-6)

    def test_ortho_6d_is_rotation(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        y = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        m = np.asarray(R.ortho_6d_to_matrix(x, y))
        for i in range(8):
            np.testing.assert_allclose(m[i] @ m[i].T, np.eye(3), atol=1e-4)
            assert np.linalg.det(m[i]) > 0.99


class TestBoxes:

    def test_corners_axis_aligned(self):
        box = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0, 0, 0]])
        c = np.asarray(B.corners(box))[0]
        assert c.shape == (8, 3)
        np.testing.assert_allclose(c.min(0), [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(c.max(0), [2, 4, 6], atol=1e-5)
        # reference ordering: corner 0 is (x0, y0, z0), corner 6 is (x1, y1, z1)
        np.testing.assert_allclose(c[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(c[6], [2, 4, 6], atol=1e-5)

    def test_volume(self):
        box = jnp.asarray([[0.0, 0, 0, 2, 3, 4, 0.3, 0.2, 0.1]])
        np.testing.assert_allclose(np.asarray(B.volume(box)), [24.0], atol=1e-5)

    def test_transform_rigid_keeps_shape(self):
        rng = np.random.RandomState(4)
        boxes = np.concatenate([
            rng.randn(8, 3), rng.uniform(0.5, 2, (8, 3)),
            rng.uniform(-1, 1, (8, 3))
        ], -1).astype(np.float32)
        ang = np.array([0.7, 0.2, -0.4], np.float32)
        mat = np.eye(4, dtype=np.float32)
        mat[:3, :3] = np_euler_zxy(ang)
        mat[:3, 3] = [1, -2, 3]
        out = np.asarray(B.transform(jnp.asarray(boxes), jnp.asarray(mat)))
        # corner clouds must match: transform(corners) == corners(transform(box))
        want = np.asarray(B.corners(jnp.asarray(boxes))) @ mat[:3, :3].T + mat[:3, 3]
        got = np.asarray(B.corners(jnp.asarray(out)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_flip_x_yaw_only(self):
        # NOTE: the reference flip formula (euler_box3d.py:269-289) is an
        # exact mirror only for yaw-only boxes; for tilted boxes it is the
        # same approximation the reference applies during augmentation. We
        # reproduce the formula bit-for-bit, so test the exact (yaw) case.
        box = jnp.asarray([[1.0, 2, 3, 2, 1, 1, 0.3, 0.0, 0.0]])
        flipped = B.flip(box, 'X')
        cf = np.asarray(B.corners(flipped))[0]
        c = np.asarray(B.corners(box))[0]
        mirrored = c * np.array([-1, 1, 1])
        # flipped corner set equals mirrored corner set (order may permute)
        for p in mirrored:
            assert np.min(np.linalg.norm(cf - p, axis=1)) < 1e-4
        # formula parity on a tilted box: angles transform as (-a+pi, b, -g)
        tilted = jnp.asarray([[1.0, 2, 3, 2, 1, 1, 0.3, 0.1, -0.2]])
        out = np.asarray(B.flip(tilted, 'X'))[0]
        np.testing.assert_allclose(
            out[6:9], [-0.3 + np.pi, 0.1, 0.2], atol=1e-6)

    def test_points_in_boxes(self):
        boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0, 0, 0],
                             [5.0, 5, 5, 1, 1, 1, 0.5, 0.2, 0.1]])
        pts = jnp.asarray([[0.0, 0, 0], [0.9, 0.9, 0.9], [1.5, 0, 0],
                           [5.0, 5, 5]])
        m = np.asarray(B.points_in_boxes(pts, boxes))
        assert m[0, 0] and m[1, 0] and not m[2, 0]
        assert m[3, 1] and not m[3, 0]

    def test_face_distances_inside_positive(self):
        boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.4, 0.3, -0.2]])
        pts = jnp.asarray([[0.0, 0, 0], [3.0, 3, 3]])
        fd = np.asarray(B.face_distances(pts, boxes))
        assert fd.shape == (2, 1, 6)
        assert fd[0, 0].min() > 0  # center is inside
        assert fd[1, 0].min() < 0  # far point is outside
        np.testing.assert_allclose(fd[0, 0], np.ones(6), atol=1e-5)


class TestProjection:

    def test_cam2img_pinhole(self):
        k = jnp.asarray([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])
        pts = jnp.asarray([[0.0, 0, 2], [1.0, 1, 2]])
        uv = np.asarray(P.points_cam2img(pts, k))
        np.testing.assert_allclose(uv[0], [64, 48], atol=1e-5)
        np.testing.assert_allclose(uv[1], [114, 98], atol=1e-5)

    def test_img2cam_roundtrip(self):
        rng = np.random.RandomState(5)
        k = jnp.asarray([[120.0, 0, 60], [0, 110, 50], [0, 0, 1]])
        pts3d = jnp.asarray(
            np.concatenate([rng.randn(32, 2), rng.uniform(1, 5, (32, 1))],
                           -1).astype(np.float32))
        uvd = P.points_cam2img(pts3d, k, with_depth=True)
        back = np.asarray(P.points_img2cam(uvd, k))
        np.testing.assert_allclose(back, np.asarray(pts3d), atol=1e-4)

    def test_batch_cam2img_matches_single(self):
        rng = np.random.RandomState(6)
        k = np.eye(4, dtype=np.float32)
        k[:3, :3] = [[100, 0, 64], [0, 100, 48], [0, 0, 1]]
        pts = rng.uniform(-1, 1, (2, 16, 3)).astype(np.float32)
        pts[..., 2] += 3
        proj = jnp.asarray(np.stack([k, k]))
        got = np.asarray(P.batch_points_cam2img(jnp.asarray(pts), proj))
        for v in range(2):
            want = np.asarray(P.points_cam2img(jnp.asarray(pts[v]), jnp.asarray(k)))
            np.testing.assert_allclose(got[v], want, atol=1e-4)


class TestIoU:

    def test_identical_boxes(self):
        boxes = jnp.asarray([[0.0, 0, 0, 2, 3, 1, 0.3, 0.2, 0.1]])
        vol, iou = IOU.boxes3d_overlap(boxes, boxes)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-3)
        np.testing.assert_allclose(np.asarray(vol), [[6.0]], atol=1e-2)

    def test_disjoint_boxes(self):
        b1 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0.0, 0, 0]])
        b2 = jnp.asarray([[10.0, 0, 0, 1, 1, 1, 0.7, 0.2, 0]])
        vol, iou = IOU.boxes3d_overlap(b1, b2)
        np.testing.assert_allclose(np.asarray(iou), [[0.0]], atol=1e-6)

    def test_axis_aligned_analytic(self):
        b1 = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0, 0, 0]])
        b2 = jnp.asarray([[1.0, 1, 1, 2, 2, 2, 0, 0, 0]])
        vol, iou = IOU.boxes3d_overlap(b1, b2)
        # overlap cube of side 1 -> vol 1; union 8 + 8 - 1 = 15
        np.testing.assert_allclose(np.asarray(vol), [[1.0]], atol=1e-3)
        np.testing.assert_allclose(np.asarray(iou), [[1 / 15]], atol=1e-4)

    def test_containment(self):
        big = jnp.asarray([[0.0, 0, 0, 4, 4, 4, 0.3, -0.1, 0.2]])
        small = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0.3, -0.1, 0.2]])
        vol, iou = IOU.boxes3d_overlap(big, small)
        np.testing.assert_allclose(np.asarray(vol), [[1.0]], atol=1e-3)
        np.testing.assert_allclose(np.asarray(iou), [[1 / 64]], atol=1e-4)

    def test_rotation_invariance(self):
        rng = np.random.RandomState(7)
        base = np.concatenate([
            rng.uniform(-1, 1, (6, 3)), rng.uniform(0.5, 2.0, (6, 3)),
            rng.uniform(-0.5, 0.5, (6, 3))
        ], -1).astype(np.float32)
        b1, b2 = jnp.asarray(base[:3]), jnp.asarray(base[3:])
        _, iou0 = IOU.boxes3d_overlap(b1, b2)
        ang = np.array([1.1, 0.4, -0.3], np.float32)
        mat = np.eye(4, dtype=np.float32)
        mat[:3, :3] = np_euler_zxy(ang)
        mat[:3, 3] = [0.5, -1.0, 2.0]
        t1 = B.transform(b1, jnp.asarray(mat))
        t2 = B.transform(b2, jnp.asarray(mat))
        _, iou1 = IOU.boxes3d_overlap(t1, t2)
        np.testing.assert_allclose(np.asarray(iou1), np.asarray(iou0), atol=2e-3)

    def test_yaw_only_vs_bev_analytic(self):
        # two unit cubes, one rotated 90 deg about z: same box -> iou 1
        b1 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0, 0, 0]])
        b2 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, np.pi / 2, 0, 0]])
        _, iou = IOU.boxes3d_overlap(b1, b2)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=2e-3)

    def test_45deg_square_overlap(self):
        # unit cube vs same cube rotated 45 deg about z:
        # BEV intersection is a regular octagon, area 2*(sqrt(2)-1) ~ 0.8284
        b1 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0, 0, 0]])
        b2 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, np.pi / 4, 0, 0]])
        vol, iou = IOU.boxes3d_overlap(b1, b2)
        want_vol = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(np.asarray(vol), [[want_vol]], atol=1e-3)

    def test_soa_kernel_matches_aos_oracle(self):
        """The shipping SoA overlap kernel (slot-unrolled, pair axis on
        lanes) must match the per-pair AoS formulation it replaced."""
        rng = np.random.RandomState(3)
        n, m = 7, 9
        mk = lambda k: np.concatenate([
            rng.uniform(-2, 2, (k, 3)), rng.uniform(0.2, 3.0, (k, 3)),
            rng.uniform(-np.pi, np.pi, (k, 3))
        ], -1).astype(np.float32)
        b1, b2 = jnp.asarray(mk(n)), jnp.asarray(mk(m))
        vol, iou = IOU.boxes3d_overlap(b1, b2)
        pair = jax.vmap(jax.vmap(IOU._pair_intersection_volume, (None, 0)),
                        (0, None))
        want = np.asarray(pair(b1, b2))
        np.testing.assert_allclose(np.asarray(vol), want,
                                   rtol=1e-4, atol=1e-5)
        # paired variant consistent with the diagonal of the pairwise call
        vp, ip = IOU.boxes3d_overlap_paired(b1, b1)
        np.testing.assert_allclose(np.asarray(ip), np.ones(n), atol=1e-3)
        vp, _ = IOU.boxes3d_overlap_paired(b1[:5], b2[:5])
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vol)[np.arange(5), np.arange(5)],
            rtol=1e-4, atol=1e-5)
        # differentiable: finite grads through the clip construction
        g = jax.grad(lambda a: IOU.boxes3d_overlap_paired(
            a, b2[:n])[1].sum())(b1)
        assert np.isfinite(np.asarray(g)).all()

    def test_soa_kernel_degenerate_boxes(self):
        """Zero-size and touching boxes: no NaNs, correct zero overlaps."""
        b1 = jnp.asarray([[0.0, 0, 0, 0, 0, 0, 0.2, 0.1, 0],    # zero dims
                          [0.0, 0, 0, 1, 1, 1, 0, 0, 0],
                          [0.0, 0, 0, 1, 1, 1, 0, 0, 0]])
        b2 = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0, 0, 0],
                          [1.0, 0, 0, 1, 1, 1, 0, 0, 0],        # touching
                          [0.0, 0, 0, 1e-5, 1e-5, 1e-5, 0, 0, 0]])
        vol, iou = IOU.boxes3d_overlap(b1, b2)
        assert np.isfinite(np.asarray(vol)).all()
        assert np.isfinite(np.asarray(iou)).all()
        assert np.asarray(vol)[0, 0] <= 1e-5    # degenerate -> ~0
        assert np.asarray(iou)[1, 1] <= 5e-3    # face-touching -> ~0

    def test_paired_iou_pruned_matches_dense(self):
        """SAT-pruned paired IoU == dense kernel when capacity covers every
        positive-bound pair; dropped pairs are exactly the zero-IoU ones."""
        rng = np.random.RandomState(7)
        p = 257  # odd size: exercises the pad/inverse-permutation path
        mk = lambda lo, hi: np.concatenate([
            rng.uniform(lo, hi, (p, 3)), rng.uniform(0.2, 1.5, (p, 3)),
            rng.uniform(-np.pi, np.pi, (p, 3))
        ], -1).astype(np.float32)
        a, b = jnp.asarray(mk(-4, 4)), jnp.asarray(mk(-4, 4))
        _, dense = IOU.boxes3d_overlap_paired(a, b)
        dense = np.asarray(dense)
        n_pos = int((np.asarray(IOU._axis_overlap_bound(a, b)) > 0).sum())
        assert 0 < n_pos < p  # fixture exercises both branches
        for cap in (n_pos, p - 1, p + 5):
            got = np.asarray(IOU.paired_iou_pruned(a, b, cap))
            np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-5)
        # under-capacity: survivors exact, dropped pairs are the
        # smallest-bound ones and read exactly 0
        small = np.asarray(IOU.paired_iou_pruned(a, b, max(n_pos // 2, 1)))
        exact_rows = small > 0
        np.testing.assert_allclose(small[exact_rows], dense[exact_rows],
                                   rtol=1e-4, atol=1e-5)

    def test_axis_aligned_iou3d_helper(self):
        b1 = jnp.asarray([[0.0, 0, 0, 2, 2, 2]])
        b2 = jnp.asarray([[1.0, 1, 1, 3, 3, 3]])
        got = np.asarray(IOU.axis_aligned_iou3d(b1, b2))
        np.testing.assert_allclose(got, [[1 / 15]], atol=1e-5)


class TestNpBoxes:

    def test_points_in_boxes_np_matches_device(self):
        from embodiedscan_tpu.geometry import boxes as B
        from embodiedscan_tpu.geometry.np_boxes import points_in_boxes_np
        rng = np.random.RandomState(3)
        pts = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
        boxes = np.concatenate([
            rng.uniform(-1, 1, (5, 3)),
            rng.uniform(0.5, 2.0, (5, 3)),
            rng.uniform(-1, 1, (5, 3)),
        ], -1).astype(np.float32)
        got = points_in_boxes_np(pts, boxes)
        want = np.asarray(B.points_in_boxes(jnp.asarray(pts),
                                            jnp.asarray(boxes)))
        np.testing.assert_array_equal(got, want)

    def test_standup_and_bev_corners(self):
        from embodiedscan_tpu.geometry.np_boxes import (boxes_to_standup_np,
                                                        corners_bev_np)
        # axis-aligned unit box at origin
        box = np.array([[0, 0, 0, 2, 4, 6, 0, 0, 0]], np.float32)
        standup = boxes_to_standup_np(box)
        np.testing.assert_allclose(standup, [[-1, -2, -3, 1, 2, 3]],
                                   atol=1e-6)
        bev = corners_bev_np(box)
        assert sorted(map(tuple, np.round(bev[0], 5))) == [
            (-1.0, -2.0), (-1.0, 2.0), (1.0, -2.0), (1.0, 2.0)]
        # 90deg yaw swaps footprint extents
        box90 = np.array([[0, 0, 0, 2, 4, 6, np.pi / 2, 0, 0]], np.float32)
        bev90 = corners_bev_np(box90)
        np.testing.assert_allclose(np.abs(bev90[0]).max(0), [2, 1], atol=1e-5)
