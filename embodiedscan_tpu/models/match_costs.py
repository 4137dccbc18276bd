"""Hungarian match costs (pure JAX, static shapes).

Functional rebuild of the reference cost classes
(``embodiedscan/models/losses/match_cost.py:50-265``). Each returns a
(num_preds, num_gts) cost matrix; weights are applied by the caller (the
grounder's assign step), matching how the reference assigner sums
weighted costs (``hungarian_assigner.py:111-116``).
"""

import jax
import jax.numpy as jnp


def bbox3d_l1_cost(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """L1 cdist over 9-dim boxes (BBox3DL1Cost, match_cost.py:50-77)."""
    return jnp.sum(jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), -1)


def iou3d_cost(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Negative exact oriented IoU (IoU3DCost, match_cost.py:96-114)."""
    from ..geometry.iou import boxes3d_iou
    return -boxes3d_iou(pred_boxes, gt_boxes)


def token_map_cost(pred_logits: jax.Array, gt_logits: jax.Array) -> jax.Array:
    """Inner-product token prediction cost (TokenMapCost, match_cost.py:80-93).

    Note: the reference returns the raw product (a *similarity*); its weight
    is expected to be negative when used as a cost.
    """
    return jnp.einsum('qc,gc->qg', pred_logits, gt_logits)


def focal_loss_cost(cls_logits: jax.Array, gt_labels: jax.Array,
                    alpha: float = 0.25, gamma: float = 2.0,
                    eps: float = 1e-12) -> jax.Array:
    """Classification focal cost (FocalLossCost, match_cost.py:117-165).

    Args:
        cls_logits: (Q, C) class logits.
        gt_labels: (G,) int class ids.
    """
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    return pos[:, gt_labels] - neg[:, gt_labels]


def mask_focal_loss_cost(cls_logits: jax.Array, gt_masks: jax.Array,
                         alpha: float = 0.25, gamma: float = 2.0,
                         eps: float = 1e-12) -> jax.Array:
    """Binary-mask focal cost, mean over elements (match_cost.py:167-189)."""
    q = cls_logits.reshape(cls_logits.shape[0], -1)
    g = gt_masks.reshape(gt_masks.shape[0], -1).astype(cls_logits.dtype)
    n = q.shape[1]
    p = jax.nn.sigmoid(q)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    return (jnp.einsum('qc,gc->qg', pos, g) +
            jnp.einsum('qc,gc->qg', neg, 1 - g)) / n


def binary_focal_cost(logits: jax.Array, pos_maps: jax.Array,
                      token_mask: jax.Array, alpha: float = 0.25,
                      gamma: float = 2.0, eps: float = 1e-12) -> jax.Array:
    """Token-map binary focal cost (BinaryFocalLossCost, match_cost.py:214-265).

    (Q, T) token logits x (G, T) positive maps -> (Q, G); padded text
    positions are excluded via ``token_mask`` (the reference gathers the
    non-padded columns instead — same sums, static shape here).
    """
    p = jax.nn.sigmoid(logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    tm = token_mask.astype(logits.dtype)
    pos = pos * tm[None, :]
    neg = neg * tm[None, :]
    return jnp.einsum('qt,gt->qg', pos, pos_maps) + \
        jnp.einsum('qt,gt->qg', neg, (1 - pos_maps) * tm[None, :])
