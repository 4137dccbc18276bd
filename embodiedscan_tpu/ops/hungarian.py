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


def auction_match(cost: jax.Array, gt_mask: jax.Array,
                  eps: float = 1e-3, max_iters: int = 2000) -> jax.Array:
    """On-device eps-optimal assignment via Bertsekas' auction algorithm.

    Pipelining upgrade over the host callback (no device->host round trip;
    runs inside jit, deterministic across devices). Bidders are the valid gt
    columns (requires Q >= number of valid gts, which the grounder's 256
    queries guarantee); items are the queries. All unassigned bidders bid
    Jacobi-style each round; single-phase eps (no price-continuation
    scaling: with more items than bidders, stale prices on ultimately
    unassigned items break the eps-scaling optimality argument — measured,
    see tests). Realistic cost matrices converge in < 10 rounds; the
    ``max_iters`` cap bounds adversarial near-tie cases, where leftover gts
    stay unmatched (treated as background, a benign degradation). The result
    is eps-optimal: total cost within ``G * eps`` of the Hungarian optimum.

    Args / returns as :func:`hungarian_match`.
    """
    q, g = cost.shape
    value = -jnp.where(gt_mask[None, :], cost, _BIG).T  # (G, Q) bidder-major
    value = jnp.nan_to_num(value, nan=-100.0, posinf=100.0, neginf=-100.0)
    gt_ids = jnp.arange(g, dtype=jnp.int32)

    def round_fn(carry):
        prices, query_of_gt, it = carry
        unassigned = (query_of_gt < 0) & gt_mask  # (G,)
        net = value - prices[None, :]  # (G, Q)
        best_j = jnp.argmax(net, axis=1)  # (G,)
        b1 = jnp.max(net, axis=1)
        net2 = net.at[gt_ids, best_j].set(-jnp.inf)
        b2 = jnp.max(net2, axis=1)
        b2 = jnp.where(jnp.isfinite(b2), b2, b1 - 1.0)  # Q == 1 edge
        bids = prices[best_j] + (b1 - b2) + eps  # (G,)
        bids = jnp.where(unassigned, bids, -jnp.inf)
        # per-query best bid; argmax ties resolve to the lowest gt index
        bid_mat = jnp.full((g, q), -jnp.inf).at[gt_ids, best_j].set(bids)
        win_bid = jnp.max(bid_mat, axis=0)  # (Q,)
        win_gt = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        got = win_bid > -jnp.inf
        # previous owner of a re-sold query loses it (winners were
        # unassigned, so winner != previous owner)
        lost = got[jnp.clip(query_of_gt, 0, q - 1)] & (query_of_gt >= 0)
        query_of_gt = jnp.where(lost, -1, query_of_gt)
        # winners take ownership: scatter only where a sale happened
        # (index g is out of bounds -> dropped), no duplicate writes
        sale_gt = jnp.where(got, win_gt, g)
        query_of_gt = query_of_gt.at[sale_gt].set(
            jnp.arange(q, dtype=jnp.int32), mode='drop')
        prices = jnp.where(got, win_bid, prices)
        return prices, query_of_gt, it + 1

    def cond(carry):
        prices, query_of_gt, it = carry
        return (jnp.sum((query_of_gt < 0) & gt_mask) > 0) & (it < max_iters)

    carry = (jnp.zeros((q,)), jnp.full((g,), -1, jnp.int32), jnp.int32(0))
    _, query_of_gt, _ = jax.lax.while_loop(cond, round_fn, carry)

    # convert gt->query into query->gt; valid gts own distinct queries
    valid = (query_of_gt >= 0) & gt_mask
    target = jnp.where(valid, query_of_gt, q)  # q = out of bounds -> drop
    assigned = jnp.full((q,), -1, jnp.int32).at[target].set(
        gt_ids, mode='drop')
    return assigned
