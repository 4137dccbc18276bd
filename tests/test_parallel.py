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
