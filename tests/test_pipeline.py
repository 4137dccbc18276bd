"""Data pipeline tests: geometry consistency of the synthetic fixture."""

import numpy as np

from embodiedscan_tpu.data import pipeline as pl
from embodiedscan_tpu.data.synthetic import make_scan, scan_to_batch


class TestPipeline:

    def test_rgbd_roundtrip(self):
        # depth of a fronto-parallel plane at 2m -> points with z=2
        k = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
        depth = np.full((64, 64), 2.0, np.float32)
        pts = pl.rgbd_to_points(depth, k)
        assert pts.shape == (64 * 64, 3)
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)

    def test_select_views_ordered(self):
        rng = np.random.RandomState(0)
        ids = pl.select_views(50, 10, True, rng)
        assert len(ids) == 10
        assert (np.diff(ids) > 0).all()

    def test_aggregation_consistency(self):
        # back-projected points, aggregated to global, should lie on the
        # original scene surfaces (room walls: x=0 / y=0 / z=0 planes)
        scan = make_scan(seed=1, n_views=4, hw=(64, 64), g=2)
        rng = np.random.RandomState(0)
        pts_list, exts = [], []
        for view in scan['views']:
            pts = pl.rgbd_to_points(view['depth'], view['intrinsic'])
            pts_list.append(pts)
            exts.append(view['extrinsic'])
        glob = pl.aggregate_points(pts_list, exts)
        room_min = glob.min(0)
        room_max = glob.max(0)
        assert (room_min > -0.5).all(), room_min
        assert (room_max < np.array([6.5, 6.5, 3.5])).all(), room_max

    def test_pack_shapes(self):
        scan = make_scan(seed=2, n_views=4, hw=(64, 64), g=6)
        batch = scan_to_batch(scan, n_views=3, num_points=2048, num_boxes=8,
                              train=True)
        assert batch['points'].shape == (2048, 3)
        assert batch['imgs'].shape == (3, 64, 64, 3)
        assert batch['proj'].shape == (3, 4, 4)
        assert batch['gt_boxes'].shape == (8, 9)
        assert batch['gt_mask'].sum() == 6
        assert np.isfinite(batch['aug_inv']).all()

    def test_projection_consistency(self):
        # a packed (augmented) point, mapped back through aug_inv and proj,
        # must land inside some view with positive depth
        scan = make_scan(seed=3, n_views=6, hw=(64, 64), g=4)
        batch = scan_to_batch(scan, n_views=6, num_points=1024, num_boxes=8,
                              train=True)
        pts = batch['points'][batch['points_mask']]
        homo = np.concatenate([pts, np.ones_like(pts[:, :1])], -1)
        unaug = (homo @ batch['aug_inv'].T)[:, :3]
        hits = np.zeros(len(pts), bool)
        for v in range(6):
            cam = (np.concatenate([unaug, np.ones_like(unaug[:, :1])], -1)
                   @ batch['proj'][v].T)
            z = cam[:, 2]
            u = cam[:, 0] / np.maximum(z, 1e-3)
            w_ = cam[:, 1] / np.maximum(z, 1e-3)
            hits |= (z > 0) & (u >= 0) & (u < 64) & (w_ >= 0) & (w_ < 64)
        assert hits.mean() > 0.5, hits.mean()

    def test_collate(self):
        scan = make_scan(seed=4, n_views=3, hw=(32, 32), g=2)
        s1 = scan_to_batch(scan, 2, 256, 4, seed=0)
        s2 = scan_to_batch(scan, 2, 256, 4, seed=1)
        batch = pl.collate([s1, s2])
        assert batch['points'].shape == (2, 256, 3)
