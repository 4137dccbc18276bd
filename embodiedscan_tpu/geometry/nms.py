"""Greedy rotated 3D NMS in pure JAX (replaces mmcv's CUDA ``nms3d``).

The reference runs per-class ``nms3d`` over candidates above a score
threshold (``fcaf3d_head.py:1666-1723``). Here all classes are processed in
one batched pass: pairwise IoU is computed once and masked by label equality
(cross-class pairs never suppress each other), and greedy suppression is a
static-shape ``fori_loop`` over score-sorted candidates.
"""

import jax
import jax.numpy as jnp

from .iou import boxes3d_iou, boxes7d_to_9d


def nms3d(boxes: jax.Array, scores: jax.Array, mask: jax.Array,
          iou_thr: float, labels: jax.Array | None = None,
          presorted: bool = False):
    """Greedy NMS over (K, 7) yaw boxes (or (K, 9): yaw-only IoU is used).

    Args:
        boxes: (K, >=7) candidate boxes.
        scores: (K,) scores; mask: (K,) validity.
        labels: optional (K,) int class ids — suppression only within a class.
        presorted: caller guarantees score-descending order (valid rows
            first) — skips the argsort, which would otherwise become a
            batched sort under vmap (PERF.md hardware table).

    Returns:
        (order, keep): ``order`` (K,) score-descending indices into the input,
        ``keep`` (K,) bool mask *in sorted order*.
    """
    k = boxes.shape[0]
    if presorted:
        order = jnp.arange(k, dtype=jnp.int32)
        b, m = boxes, mask
    else:
        neg = jnp.finfo(scores.dtype).min
        order = jnp.argsort(jnp.where(mask, -scores, -neg))
        b = boxes[order]
        m = mask[order]
    # yaw-only IoU like mmcv nms3d: zero out pitch/roll
    b9 = boxes7d_to_9d(b[:, :7])
    iou = boxes3d_iou(b9, b9)
    if labels is not None:
        lab = labels[order]
        iou = jnp.where(lab[:, None] == lab[None, :], iou, 0.0)

    def body(i, suppressed):
        alive_i = jnp.logical_not(suppressed[i]) & m[i]
        row = (iou[i] > iou_thr) & (jnp.arange(k) > i)
        return jnp.where(alive_i, suppressed | row, suppressed)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep = jnp.logical_not(suppressed) & m
    return order, keep
