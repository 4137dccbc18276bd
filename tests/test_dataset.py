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
