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


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axes: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """Build a 1D (or reshaped) device mesh over the given devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if len(axes) == 1:
        return Mesh(devs, axes)
    # reserved growth path: factor devices into (data, model) grids etc.
    shape = (len(devs) // np.prod([1]), )
    return Mesh(devs.reshape(shape), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of (B, ...) arrays with B sharded over data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
