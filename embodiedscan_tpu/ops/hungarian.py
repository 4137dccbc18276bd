"""Hungarian matching for DETR-style heads.

The reference assigner (``models/task_modules/assigners/hungarian_assigner.py``)
moves the cost matrix to CPU and calls scipy under ``torch.no_grad()``. We keep
the same contract on TPU via ``jax.pure_callback`` (matching happens outside
the gradient path), with masked/padded static shapes: invalid gt columns carry
a huge cost so they are never preferred, and their matches are discarded.

An on-device auction-algorithm path is a future optimization; the callback is
exact and matches the reference bit-for-bit (same scipy routine).
"""

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e8


def _scipy_assign(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    cost = np.nan_to_num(np.asarray(cost, np.float64), nan=100.0,
                         posinf=100.0, neginf=-100.0)
    rows, cols = linear_sum_assignment(cost)
    out = np.full(cost.shape[0], -1, np.int32)
    out[rows] = cols.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array, gt_mask: jax.Array) -> jax.Array:
    """Match queries to (padded) ground truths.

    Args:
        cost: (Q, G) match cost (lower is better).
        gt_mask: (G,) validity of gt columns.

    Returns:
        (Q,) int32: matched gt index per query, -1 if unmatched (background).
    """
    q, g = cost.shape
    masked_cost = jnp.where(gt_mask[None, :], cost, _BIG)
    assigned = jax.pure_callback(
        _scipy_assign, jax.ShapeDtypeStruct((q,), jnp.int32), masked_cost,
        vmap_method='sequential')
    # discard assignments to padded gts (every query gets a column when
    # Q <= G, including invalid ones)
    valid = (assigned >= 0) & jnp.where(assigned >= 0,
                                        gt_mask[jnp.clip(assigned, 0, g - 1)],
                                        False)
    return jnp.where(valid, assigned, -1)
