"""Native host-pipeline core: parity vs the numpy pipeline.

The C++ core (embodiedscan_tpu/native) replaces the reference's CPU
dataloader-worker math (transforms/points.py back-projection, multiview.py
aggregation, data_preprocessor normalization). Back-projection must match
numpy to float32 round-off; sampling is deterministic per seed (not
numpy-bit-identical, by contract).
"""

import numpy as np
import pytest

from embodiedscan_tpu import native
from embodiedscan_tpu.data import pipeline as pl

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native core unavailable (no g++)')


def _views(rng, v=3, h=48, w=64):
    depths = (rng.rand(v, h, w) * 4).astype(np.float32)
    depths[depths < 1.0] = 0.0
    ks = np.stack([
        np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
        for _ in range(v)
    ])
    exts = []
    for i in range(v):
        ang = i * 1.1
        c, s = np.cos(ang), np.sin(ang)
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        e[:3, 3] = [0.3 * i, -0.2, 1.0 + 0.1 * i]
        exts.append(e)
    return depths, ks, np.stack(exts)


class TestBackproject:

    def test_world_frame_parity(self):
        rng = np.random.RandomState(0)
        depths, ks, exts = _views(rng)
        pts, counts = native.multiview_backproject(depths, ks, exts)
        ref = pl.aggregate_points_list(
            [pl.rgbd_to_points(depths[i], ks[i]) for i in range(len(depths))],
            list(exts))
        for i, r in enumerate(ref):
            n = int(counts[i])
            assert n == len(r)
            np.testing.assert_allclose(pts[i, :n], r, atol=1e-4)

    def test_camera_frame_parity(self):
        rng = np.random.RandomState(1)
        depths, ks, _ = _views(rng, v=2)
        pts, counts = native.multiview_backproject(depths, ks, None)
        for i in range(2):
            ref = pl.rgbd_to_points(depths[i], ks[i])
            np.testing.assert_allclose(pts[i, :int(counts[i])], ref,
                                       atol=1e-4)

    def test_depth_scale_and_empty(self):
        rng = np.random.RandomState(2)
        depths, ks, exts = _views(rng, v=2)
        scaled, c1 = native.multiview_backproject(depths * 1000.0, ks, exts,
                                                  depth_scale=1000.0)
        plain, c2 = native.multiview_backproject(depths, ks, exts)
        assert (c1 == c2).all()
        np.testing.assert_allclose(scaled[0, :int(c1[0])],
                                   plain[0, :int(c2[0])], atol=1e-3)
        # all-zero depth -> zero count, no crash
        zero = np.zeros_like(depths)
        _, cz = native.multiview_backproject(zero, ks, exts)
        assert (cz == 0).all()

    def test_singular_matrix_raises(self):
        depths = np.ones((1, 4, 4), np.float32)
        k = np.zeros((1, 3, 3), np.float32)  # singular intrinsic
        with pytest.raises(ValueError):
            native.multiview_backproject(depths, k, None)


class TestSampling:

    def test_deterministic_and_unique(self):
        a = native.sample_indices(10000, 512, seed=7)
        b = native.sample_indices(10000, 512, seed=7)
        assert (a == b).all()
        assert len(np.unique(a)) == 512  # without replacement when n >= num
        assert a.min() >= 0 and a.max() < 10000

    def test_with_replacement_when_short(self):
        idx = native.sample_indices(10, 64, seed=3)
        assert idx.min() >= 0 and idx.max() < 10 and len(idx) == 64

    def test_seed_changes_sample(self):
        a = native.sample_indices(10000, 512, seed=1)
        b = native.sample_indices(10000, 512, seed=2)
        assert (a != b).any()

    def test_gather_rows(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(100, 3).astype(np.float32)
        idx = native.sample_indices(100, 32, seed=5)
        np.testing.assert_array_equal(native.gather_rows3(pts, idx), pts[idx])


class TestNormalize:

    def test_parity(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        out = native.normalize_imgs_u8(imgs, pl.IMG_MEAN, pl.IMG_STD)
        ref = pl.normalize_imgs(imgs)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_bgr_swap(self):
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
        out = native.normalize_imgs_u8(imgs, pl.IMG_MEAN, pl.IMG_STD,
                                       bgr_to_rgb=True)
        ref = pl.normalize_imgs(imgs[None], bgr_to_rgb=True)[0]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_depth_u16(self):
        rng = np.random.RandomState(2)
        d16 = rng.randint(0, 65535, (32, 32)).astype(np.uint16)
        np.testing.assert_allclose(native.depth_u16_to_f32(d16, 4000.0),
                                   d16.astype(np.float32) / 4000.0,
                                   atol=1e-6)


class TestPipelineIntegration:

    def test_multiview_world_points_backends_agree_on_set(self):
        """Native and numpy sample the SAME underlying point set."""
        rng = np.random.RandomState(0)
        depths, ks, exts = _views(rng, v=2)
        nat = pl.multiview_world_points(list(depths), list(ks), list(exts),
                                        256, np.random.RandomState(1),
                                        native='auto')
        ref_full = pl.aggregate_points_list(
            [pl.rgbd_to_points(depths[i], ks[i]) for i in range(2)],
            list(exts))
        for got, full in zip(nat, ref_full):
            assert got.shape == (256, 3)
            # every sampled row must be an exact member of the full set
            d = np.abs(got[:, None, :] - full[None, :, :]).sum(-1).min(1)
            assert d.max() < 1e-4

    def test_numpy_fallback_matches_legacy(self):
        rng = np.random.RandomState(0)
        depths, ks, exts = _views(rng, v=2)
        r1 = np.random.RandomState(7)
        got = pl.multiview_world_points(list(depths), list(ks), list(exts),
                                        128, r1, native='numpy')
        r2 = np.random.RandomState(7)
        ref = pl.aggregate_points_list(
            [pl.point_sample(pl.rgbd_to_points(depths[i], ks[i]), 128, r2)
             for i in range(2)], list(exts))
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, atol=1e-5)
