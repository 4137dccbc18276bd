"""Multi-device (virtual CPU mesh) tests for the training step."""

import numpy as np

import jax


class TestMultiChip:

    def test_dryrun_8_devices(self):
        import __graft_entry__ as g
        assert len(jax.devices()) >= 8
        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out))


class TestViewParallelMesh:
    """2D (data, view) mesh helpers (SURVEY §5.7 sequence parallelism)."""

    def test_shardings(self):
        from jax.sharding import PartitionSpec as P

        from embodiedscan_tpu.parallel import mesh as M
        mesh2 = M.make_mesh(jax.devices()[:8], view_parallel=2)
        assert mesh2.axis_names == ('data', 'view')
        assert mesh2.devices.shape == (4, 2)
        assert M.batch_sharding(mesh2, 'imgs').spec == P('data', 'view')
        assert M.batch_sharding(mesh2, 'points').spec == P('data')
        mesh1 = M.make_mesh(jax.devices()[:8])
        assert M.batch_sharding(mesh1, 'imgs').spec == P('data')

    def test_shard_batch_places_views(self):
        import jax.numpy as jnp

        from embodiedscan_tpu.parallel import mesh as M
        mesh2 = M.make_mesh(jax.devices()[:8], view_parallel=2)
        batch = dict(imgs=jnp.zeros((4, 2, 8, 8, 3)),
                     points=jnp.zeros((4, 16, 3)))
        sharded = M.shard_batch(mesh2, batch)
        assert sharded['imgs'].sharding.spec != sharded['points'].sharding.spec


class TestShardedEval:
    """pjit-sharded inference + host gather (the TPU replacement for the
    reference's rank-sharded collect_results, det_metric.py:124-158)."""

    def test_evaluate_shards_over_8_devices(self):
        from embodiedscan_tpu.configs.base import mv_det3d
        from embodiedscan_tpu.train.loop import evaluate
        cfg = mv_det3d()
        cfg.data.synthetic = True
        cfg.n_devices = 8
        # 3 scans over 8 devices: exercises the padded tail chunk
        cfg.data.n_views_test = 2
        cfg.data.n_points = 256
        cfg.data.points_per_view = 128
        cfg.data.max_boxes = 4
        cfg.data.image_hw = (32, 32)
        cfg.model.input_capacity = 256
        cfg.model.backbone_capacities = (256, 128, 128, 64, 32, 16)
        cfg.model.fpn_capacities = (128, 64, 32, 16)
        cfg.model.num_classes = 5
        cfg.model.resnet_depth = 18
        cfg.model.mink_depth = 18
        cfg.model.max_dets = 16
        cfg.model.nms_pre = 32
        cfg.model.max_candidates = 32
        cfg.work_dir = '/tmp/sharded_eval_test'
        metrics = evaluate(cfg, max_scenes=3)
        assert any('AP' in k for k in metrics), metrics.keys()
        for v in metrics.values():
            assert np.isfinite(v)
