"""Device mesh and sharding helpers — the framework's only collective surface.

Replaces the reference's NCCL/mmengine distributed layer (SURVEY.md §2c,
§5.8: ``dist_utils.py:4-10`` reduce_mean, DDP gradient all-reduce) with the
TPU-native model: one named mesh, batch sharded over the ``data`` axis, model
state replicated; XLA inserts the all-reduces. ``view`` and ``model`` axes
are reserved for view-parallel fusion / tensor parallelism growth paths.

Under pjit, the reference's explicit collectives disappear:
- ``reduce_mean(n_pos)`` -> ``jnp.mean`` over the globally sharded batch.
- DDP gradient all-reduce -> implicit in the sharded ``jax.grad``.
- metric gather -> ``jax.experimental.multihost_utils`` / host transfer.
"""

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
VIEW_AXIS = 'view'

# batch keys carrying a per-view leading-2 layout (B, V, ...): these shard
# over the view axis in a 2D mesh. Everything else is view-replicated.
_VIEW_KEYS = ('imgs', 'proj', 'view_mask')


def make_mesh(devices: Sequence[jax.Device] | None = None,
              view_parallel: int = 1) -> Mesh:
    """Build the device mesh.

    ``view_parallel=1``: 1D ``(data,)`` mesh (the reference's DDP analog).
    ``view_parallel=k``: 2D ``(data, view)`` mesh — the framework's
    sequence-parallel axis (SURVEY.md §5.7): the multi-view image backbone
    and per-view fusion shard over views; the masked mean over views becomes
    a ``psum`` XLA inserts at the fusion reduction.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if view_parallel <= 1:
        return Mesh(devs, (DATA_AXIS,))
    assert len(devs) % view_parallel == 0, (
        f'{len(devs)} devices not divisible by view_parallel={view_parallel}')
    grid = devs.reshape(len(devs) // view_parallel, view_parallel)
    return Mesh(grid, (DATA_AXIS, VIEW_AXIS))


def batch_sharding(mesh: Mesh, key: str | None = None) -> NamedSharding:
    """Sharding for one batch entry: batch dim over data; views over view.

    With a 1D mesh every entry shards as ``P('data')``. With a
    ``(data, view)`` mesh, per-view arrays (imgs/proj/view_mask) shard their
    V axis too; per-scene arrays stay view-replicated.
    """
    if VIEW_AXIS in mesh.axis_names and (key is None or key in _VIEW_KEYS):
        return NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Per-entry shardings pytree for jit in_shardings."""
    return {k: batch_sharding(mesh, k) for k in batch}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of (B, ...) arrays with B sharded over data."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, k))
        for k, v in batch.items()
    }


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
