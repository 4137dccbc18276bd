"""Multi-host (multi-process) runtime wiring.

The reference launches one process per GPU via ``--launcher
{pytorch,slurm,mpi}`` (``tools/train.py:46-49``) with NCCL rendezvous env
tweaks (``tools/mv-grounding.sh:17-29``). The TPU-native equivalent is
``jax.distributed.initialize`` — one process per host, all chips of a slice
visible as ``jax.devices()``, DCN handled by the runtime. This module is
the only place that knows about process indices.

Per-host data loading follows the reference's ``DistSamplerSeedHook``
semantics (``configs/default_runtime.py:9``): every process reads the shard
``process_index::process_count`` of the scan list and feeds its local batch
rows; ``host_local_to_global`` assembles the globally-sharded array.
"""

import os
from typing import Any, Optional

import jax

from .mesh import make_mesh  # noqa: F401  (re-export for CLI convenience)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX if a cluster environment is present.

    Auto-detects slurm/GKE/TPU-pod environments the way
    ``jax.distributed.initialize`` does; explicit args override. Returns
    True when distributed mode is active (process_count > 1), False for
    the single-process fallback (the reference's ``--launcher none``).
    Safe to call twice (idempotent no-op after the first).
    """
    if jax.process_count() > 1:
        return True
    has_env = coordinator or os.environ.get('COORDINATOR_ADDRESS') \
        or os.environ.get('SLURM_JOB_ID') or os.environ.get('JAX_COORDINATOR')
    if not has_env:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process slurm step
        pass
    return jax.process_count() > 1


def process_shard(n_items: int) -> range:
    """Index range of the scan list owned by this process
    (det_metric.py:124-158 rank-sharding semantics, done at load time)."""
    return range(jax.process_index(), n_items, jax.process_count())


def local_device_count() -> int:
    return jax.local_device_count()


def global_batch_size(per_host_batch: int) -> int:
    return per_host_batch * jax.process_count()


def host_local_to_global(mesh, batch: Any) -> Any:
    """Per-host local batch rows -> one globally-sharded jax.Array.

    Each process passes its (B_local, ...) arrays; the result is a global
    (B_local * process_count, ...) array sharded over the mesh's data axis.
    Single-process: equivalent to ``shard_batch``.
    """
    from jax.experimental import multihost_utils

    from .mesh import batch_sharding
    if jax.process_count() == 1:
        from .mesh import shard_batch
        return shard_batch(mesh, batch)
    return {
        k: multihost_utils.host_local_array_to_global_array(
            v, mesh, batch_sharding(mesh, k).spec)
        for k, v in batch.items()
    }


def fetch_local(mesh, tree: Any) -> Any:
    """Sharded device output -> this process's host-local rows.

    Single-process: plain ``jax.device_get``. Multi-process: each host gets
    the (B_local, ...) slice of every data-sharded array it owns — the
    per-rank half of the reference's ``collect_results`` protocol
    (det_metric.py:126-142); :func:`gather_objects` is the other half.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    from .mesh import batch_sharding
    if isinstance(tree, dict):
        return {
            k: multihost_utils.global_array_to_host_local_array(
                v, mesh, batch_sharding(mesh, k).spec)
            for k, v in tree.items()
        }
    return multihost_utils.global_array_to_host_local_array(
        tree, mesh, jax.sharding.PartitionSpec('data'))


def gather_objects(objs: list) -> list:
    """All-gather a per-process python list (rank order preserved).

    The mmengine ``collect_results`` analog (det_metric.py:126-142): each
    process contributes its local eval records; every process receives the
    concatenation ordered by rank. Implemented as pickle -> padded uint8
    allgather (JAX collectives move arrays, not objects).
    """
    if jax.process_count() == 1:
        return list(objs)
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(objs), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64))  # (P, 1)
    pad = int(sizes.max())
    padded = np.zeros((pad,), np.uint8)
    padded[:blob.size] = blob
    all_blobs = multihost_utils.process_allgather(padded)  # (P, pad)
    out = []
    for rank in range(jax.process_count()):
        n = int(sizes[rank, 0])
        out.extend(pickle.loads(all_blobs[rank, :n].tobytes()))
    return out


def all_processes_scalar(x) -> float:
    """Mean of a host scalar across processes (logging/metric sync) —
    the ``reduce_mean`` analog outside jit (dist_utils.py:4-10)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    import numpy as np
    arr = multihost_utils.process_allgather(np.asarray(x, np.float32))
    return float(arr.mean())


def is_main_process() -> bool:
    """Checkpoint/log gating (mmengine ``is_main_process`` analog)."""
    return jax.process_index() == 0
