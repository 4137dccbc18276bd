"""On-disk dataset parser test with a fabricated reference-format pkl."""

import os

import numpy as np


class TestDataset:

    def test_parse_scan(self, fake_data):
        from embodiedscan_tpu.data.dataset import load_info_pkl, parse_scan
        infos, meta = load_info_pkl(
            os.path.join(fake_data, 'embodiedscan_infos_train.pkl'))
        assert len(infos) == 3
        scan = parse_scan(infos[0], fake_data)
        assert len(scan['views']) == 4
        assert scan['depth_shift'] == 1000.0
        assert scan['gt_boxes'].shape == (2, 9)
        # extrinsic = inv(axis_align @ cam2global)
        want = np.linalg.inv(np.eye(4) @ infos[0]['images'][1]['cam2global'])
        np.testing.assert_allclose(scan['views'][1]['extrinsic'], want,
                                   atol=1e-5)

    def test_loader_batches(self, fake_data):
        from embodiedscan_tpu.configs.base import mv_det3d
        from embodiedscan_tpu.data.dataset import EmbodiedScanLoader
        cfg = mv_det3d()
        cfg.data.data_root = fake_data
        cfg.data.batch_size = 2
        cfg.data.n_views_train = 3
        cfg.data.n_points = 1024
        cfg.data.points_per_view = 512
        cfg.data.max_boxes = 4
        cfg.data.image_hw = (32, 32)
        cfg.data.repeat_times = 1
        loader = EmbodiedScanLoader(cfg, train=True)
        batch = next(iter(loader))
        assert batch['points'].shape == (2, 1024, 3)
        assert batch['imgs'].shape == (2, 3, 32, 32, 3)
        assert batch['proj'].shape == (2, 3, 4, 4)
        assert batch['gt_mask'].sum() == 4  # 2 boxes per scan
        assert np.isfinite(batch['points']).all()
        # depth 0.5-3m, cameras at z=1.5 looking along +z -> global z sane
        pts = batch['points'][batch['points_mask']]
        assert np.abs(pts).max() < 20

    def test_cont_loader_sweeps(self, fake_data):
        """Continuous pseudo-batch: cumulative points, growing GT
        (ConstructMultiSweeps, reference multiview.py:173-248)."""
        from embodiedscan_tpu.configs.base import cont_det3d
        from embodiedscan_tpu.data.dataset import EmbodiedScanLoader
        cfg = cont_det3d()
        cfg.data.data_root = fake_data
        cfg.data.n_views_train = 3
        cfg.data.n_points = 2048
        cfg.data.points_per_view = 512
        cfg.data.max_boxes = 4
        cfg.data.image_hw = (32, 32)
        loader = EmbodiedScanLoader(cfg, train=True)
        batch = next(iter(loader))
        v = 3
        assert batch['points'].shape == (v, 2048, 3)
        assert batch['imgs'].shape == (1, v, 32, 32, 3)
        assert batch['proj'].shape == (1, v, 4, 4)
        assert batch['aug_inv'].shape == (1, 4, 4)
        # lower-triangular view mask; cumulative point counts
        np.testing.assert_array_equal(batch['view_mask'],
                                      np.tril(np.ones((v, v), bool)))
        counts = batch['points_mask'].sum(-1)
        assert counts[0] == 512 and counts[1] == 1024 and counts[2] == 1536
        # cumulative visibility: GT counts never shrink, end at all-visible
        gt_counts = batch['gt_mask'].sum(-1)
        assert (np.diff(gt_counts) >= 0).all()
        assert gt_counts[-1] == 2

    def test_pack_sweeps_strict_gt_growth(self):
        """A later sweep sees strictly more GT once a new instance appears
        (reference multiview.py:193-223 cumulative union)."""
        from embodiedscan_tpu.data import pipeline as pl
        rng = np.random.RandomState(0)
        v, ppv = 3, 64
        view_pts = [rng.randn(ppv, 3).astype(np.float32) for _ in range(v)]
        vis_ids = [np.array([0]), np.array([0, 1]), np.array([0, 1, 2])]
        imgs = np.zeros((v, 8, 8, 3), np.float32)
        ks = [np.eye(4, dtype=np.float32)] * v
        exts = [np.eye(4, dtype=np.float32)] * v
        boxes = np.tile(np.array([[1, 1, 1, 1, 1, 1, 0, 0, 0]], np.float32),
                        (3, 1))
        labels = np.arange(3, dtype=np.int64)
        s = pl.pack_sweeps(view_pts, vis_ids, imgs, ks, exts, boxes, labels,
                           None, 256, 8, rng)
        np.testing.assert_array_equal(s['gt_mask'].sum(-1), [1, 2, 3])
        assert s['imgs'].shape[0] == 1 and s['points'].shape[0] == v

    def test_occ_visible_masks(self, fake_data):
        """mv-occ: OR of per-view masks; cont-occ: cumulative per sweep
        (ConstructMultiViewMasks / ConstructMultiSweeps)."""
        from embodiedscan_tpu.configs.base import cont_occ, mv_occ
        from embodiedscan_tpu.data.dataset import EmbodiedScanLoader

        def small(cfg):
            cfg.data.data_root = fake_data
            cfg.data.n_views_train = 3
            cfg.data.n_points = 1024
            cfg.data.points_per_view = 512
            cfg.data.max_boxes = 4
            cfg.data.image_hw = (32, 32)
            cfg.data.batch_size = 1
            # fake occupancy grids are 8x8x4
            cfg.model.n_voxels = (8, 8, 4)
            # the fake scans live around the origin: keep the default range
            return cfg

        loader = EmbodiedScanLoader(small(mv_occ()), train=True)
        batch = next(iter(loader))
        assert batch['visible_mask'].shape == (1, 8, 8, 4)
        assert batch['gt_occ'].shape[0] == 1

        loader = EmbodiedScanLoader(small(cont_occ()), train=True)
        batch = next(iter(loader))
        assert batch['visible_mask'].shape == (3, 8, 8, 4)
        # cumulative-or masks are monotone non-decreasing
        m = batch['visible_mask']
        assert ((m[0] <= m[1]).all() and (m[1] <= m[2]).all())
        assert m[0].sum() < m[2].sum()
        assert batch['gt_occ'].shape == (3,) + batch['gt_occ'].shape[1:]

    def test_points_range_filter(self):
        from embodiedscan_tpu.data.pipeline import points_range_filter
        pts = np.array([[0.0, 0, 0], [5, 0, 0], [-5, 0, 0], [1, 1, 1]],
                       np.float32)
        out = points_range_filter(pts, (-3.2, -3.2, -0.78, 3.2, 3.2, 1.78))
        assert len(out) == 2

    def test_matterport_depth_shift(self, fake_data):
        from embodiedscan_tpu.data.dataset import load_info_pkl, parse_scan
        infos, _ = load_info_pkl(
            os.path.join(fake_data, 'embodiedscan_infos_train.pkl'))
        info = dict(infos[0], sample_idx='matterport3d/xx/region1')
        scan = parse_scan(info, fake_data)
        assert scan['depth_shift'] == 4000.0


class TestGroundingJoin:

    def test_join_vg(self, fake_data):
        from embodiedscan_tpu.data.dataset import (join_vg_annotations,
                                                   load_info_pkl)
        infos, _ = load_info_pkl(
            os.path.join(fake_data, 'embodiedscan_infos_train.pkl'))
        vg = [
            dict(scan_id=infos[0]['sample_idx'],
                 text='find the chair in front of the table',
                 target='chair', target_id=0, distractor_ids=[1, 2, 3, 4]),
            dict(scan_id=infos[1]['sample_idx'],
                 text='the only bed', target='bed', target_id=1,
                 distractor_ids=[]),
            dict(scan_id='missing/scene', text='x', target_id=0,
                 distractor_ids=[]),
            dict(scan_id=infos[0]['sample_idx'], text='bad target',
                 target='x', target_id=99, distractor_ids=[]),
        ]
        recs = join_vg_annotations(infos, vg)
        assert len(recs) == 2  # missing scan + bad target dropped
        assert recs[0]['is_view_dep'] and recs[0]['is_hard']
        assert not recs[0]['is_unique']
        assert recs[1]['is_unique'] and not recs[1]['is_view_dep']
        assert recs[0]['target_rows'] == [0]
        # tokens_positive rebuilt from the target word span
        (spans,) = recs[0]['tokens_positive']
        beg, end = spans[0]
        assert recs[0] is not None
        assert 'chair' == 'find the chair in front of the table'[beg:end]

    def test_multi_target(self, fake_data):
        from embodiedscan_tpu.data.dataset import (join_vg_annotations,
                                                   load_info_pkl)
        infos, _ = load_info_pkl(
            os.path.join(fake_data, 'embodiedscan_infos_train.pkl'))
        vg = [dict(scan_id=infos[0]['sample_idx'], text='both chairs here',
                   target='both chairs', target_id=[0, 1],
                   distractor_ids=[1])]
        recs = join_vg_annotations(infos, vg)
        assert len(recs) == 1 and recs[0]['target_rows'] == [0, 1]
