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
