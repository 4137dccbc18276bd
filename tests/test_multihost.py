"""Multi-host wiring (parallel/multihost.py): single-process semantics.

True multi-process runs need a cluster; these tests pin the contracts that
must hold in the 1-process degenerate case (the reference's dist utils
degrade the same way — dist_utils.py:6-7 returns the input when
uninitialized) plus the per-host sharding arithmetic.
"""

import numpy as np

import jax

from embodiedscan_tpu.parallel import multihost as MH
from embodiedscan_tpu.parallel.mesh import make_mesh


class TestSingleProcess:

    def test_init_noop_without_cluster_env(self, monkeypatch):
        for var in ('COORDINATOR_ADDRESS', 'SLURM_JOB_ID', 'JAX_COORDINATOR'):
            monkeypatch.delenv(var, raising=False)
        assert MH.init_distributed() is False
        assert MH.is_main_process()

    def test_process_shard_covers_all(self):
        idx = list(MH.process_shard(10))
        assert idx == list(range(10))

    def test_global_batch_size(self):
        assert MH.global_batch_size(4) == 4 * jax.process_count()

    def test_all_processes_scalar(self):
        assert MH.all_processes_scalar(2.5) == 2.5

    def test_host_local_to_global_matches_shard_batch(self):
        mesh = make_mesh(jax.devices()[:4])
        batch = dict(points=np.arange(24, dtype=np.float32).reshape(4, 3, 2))
        out = MH.host_local_to_global(mesh, batch)
        np.testing.assert_allclose(np.asarray(out['points']),
                                   batch['points'])
        assert out['points'].sharding.spec == ('data',) or \
            out['points'].sharding.spec[0] == 'data'


class TestShardArithmetic:

    def test_process_shard_partition(self):
        """Simulated k-process sharding partitions the index set exactly."""
        n, k = 23, 4
        shards = [set(range(r, n, k)) for r in range(k)]
        assert set().union(*shards) == set(range(n))
        assert sum(len(s) for s in shards) == n
