"""Exact oriented 3D box overlap / IoU in pure JAX (TPU-friendly).

Replaces pytorch3d ``box3d_overlap`` (used by the reference at
``embodiedscan/structures/bbox_3d/euler_box3d.py:134``,
``models/losses/match_cost.py:104`` and the eval engine
``eval/indoor_eval.py:127``) with a static-shape algorithm:

The intersection of two convex boxes is bounded by clipped pieces of the two
boxes' faces. We clip each face quad of box A against the 6 half-spaces of box
B (Sutherland-Hodgman with fixed-size vertex buffers), and vice versa, keeping
outward winding; the enclosed volume then follows from the divergence theorem
as a signed sum of origin-tetrahedra over all face-fan triangles. Everything is
masked/branch-free, so it vmaps over N x M pairs and runs on the VPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import f32_matmuls
from .boxes import corners as box_corners
from .rotations import euler_zxy_to_matrix

# Outward-wound face quads for the reference corner ordering
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0).
_FACE_IDX = np.array([
    [0, 1, 2, 3],  # x- face
    [4, 7, 6, 5],  # x+
    [0, 4, 5, 1],  # y-
    [3, 2, 6, 7],  # y+
    [0, 3, 7, 4],  # z-
    [1, 5, 6, 2],  # z+
], dtype=np.int32)

# 6 quad corners can gain one vertex per clip; 6 clips -> at most 10 vertices.
_POLY_CAP = 12


def _box_planes(box: jax.Array):
    """(9,) box -> outward half-space planes: normals (6, 3), offsets (6,).

    Inside means ``n . p <= d`` for all six planes.
    """
    rot = euler_zxy_to_matrix(box[6:9])  # columns are box axes
    axes = rot.T  # (3, 3): rows are axis directions in world frame
    center = box[:3]
    half = box[3:6] / 2
    normals = jnp.concatenate([axes, -axes], axis=0)  # (6, 3)
    offsets = normals @ center + jnp.concatenate([half, half])
    return normals, offsets


def _clip_halfspace(poly: jax.Array, cnt: jax.Array, normal: jax.Array,
                    offset: jax.Array):
    """Clip a packed convex polygon by one half-space ``n . p <= d``.

    Args:
        poly: (K, 3) vertex buffer, first ``cnt`` entries valid, wound order.
        cnt: scalar int32 count of valid vertices.

    Returns:
        (new_poly, new_cnt) with the same buffer size.
    """
    k = poly.shape[0]
    idx = jnp.arange(k)
    nxt_idx = jnp.where(idx + 1 < cnt, idx + 1, 0)
    cur = poly
    nxt = poly[nxt_idx]
    d_cur = cur @ normal - offset
    d_nxt = nxt @ normal - offset
    cur_in = d_cur <= 0.0
    nxt_in = d_nxt <= 0.0
    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    inter = cur + t[:, None] * (nxt - cur)

    active = idx < cnt
    emit_cur = cur_in & active
    emit_inter = (cur_in != nxt_in) & active
    n_emit = emit_cur.astype(jnp.int32) + emit_inter.astype(jnp.int32)
    pos = jnp.cumsum(n_emit) - n_emit

    out = jnp.zeros((k + 1, 3), dtype=poly.dtype)
    dump = k  # writes from non-emitting lanes land in the spare slot
    out = out.at[jnp.where(emit_cur, pos, dump)].add(
        jnp.where(emit_cur[:, None], cur, 0.0))
    inter_pos = pos + emit_cur.astype(jnp.int32)
    out = out.at[jnp.where(emit_inter, inter_pos, dump)].add(
        jnp.where(emit_inter[:, None], inter, 0.0))
    return out[:k], jnp.sum(n_emit)


def _clipped_faces_volume(polys: jax.Array, cnts: jax.Array,
                          normals: jax.Array, offsets: jax.Array):
    """Clip face polygons by 6 half-spaces and return their signed volume sum.

    Args:
        polys: (F, K, 3) packed face quads (wound outward).
        cnts: (F,) vertex counts.
        normals/offsets: (6, 3) / (6,) clipping half-spaces.

    Returns:
        Scalar signed volume contribution (divergence theorem from origin).
    """
    clip = jax.vmap(_clip_halfspace, in_axes=(0, 0, None, None))
    for j in range(6):
        polys, cnts = clip(polys, cnts, normals[j], offsets[j])

    k = polys.shape[1]
    v0 = polys[:, 0]  # (F, 3)
    vi = polys[:, 1:k - 1]  # (F, K-2, 3)
    vj = polys[:, 2:k]  # (F, K-2, 3)
    tri_valid = (jnp.arange(2, k)[None, :] < cnts[:, None])  # vj index < cnt
    det = jnp.einsum('fij,fij->fi', jnp.cross(vi, vj),
                     jnp.broadcast_to(v0[:, None, :], vi.shape))
    return jnp.sum(jnp.where(tri_valid, det, 0.0)) / 6.0


def _pair_intersection_volume(box1: jax.Array, box2: jax.Array) -> jax.Array:
    """Exact intersection volume of two (9,) euler boxes."""
    c1 = box_corners(box1[None])[0]  # (8, 3)
    c2 = box_corners(box2[None])[0]
    f1 = c1[_FACE_IDX]  # (6, 4, 3)
    f2 = c2[_FACE_IDX]
    pad = jnp.zeros((6, _POLY_CAP - 4, 3), dtype=f1.dtype)
    polys1 = jnp.concatenate([f1, pad], axis=1)
    polys2 = jnp.concatenate([f2, pad], axis=1)
    cnts = jnp.full((6,), 4, dtype=jnp.int32)

    n1, d1 = _box_planes(box1)
    n2, d2 = _box_planes(box2)
    # Scale-aware tolerances: keep box1 faces that graze box2's boundary
    # (float error on coincident faces), but shrink box1's half-spaces when
    # clipping box2's faces so coplanar faces are counted exactly once.
    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(d1)), jnp.max(jnp.abs(d2)))
    eps_keep = 1e-5 * scale
    eps_copl = 3e-5 * scale
    vol = _clipped_faces_volume(polys1, cnts, n2, d2 + eps_keep)
    vol = vol + _clipped_faces_volume(polys2, cnts, n1, d1 - eps_copl)
    return jnp.maximum(vol, 0.0)


@functools.partial(jax.jit, static_argnames=())
@f32_matmuls
def boxes3d_overlap(boxes1: jax.Array, boxes2: jax.Array):
    """Pairwise exact intersection volume and IoU of oriented 9-DoF boxes.

    Args:
        boxes1: (N, 9) euler boxes.
        boxes2: (M, 9) euler boxes.

    Returns:
        (vol, iou): both (N, M). Mirrors pytorch3d ``box3d_overlap`` semantics
        (reference euler_box3d.py:104-135) for well-formed boxes.
    """
    pair = jax.vmap(jax.vmap(_pair_intersection_volume, (None, 0)), (0, None))
    vol = pair(boxes1, boxes2)
    v1 = jnp.abs(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    v2 = jnp.abs(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    union = v1[:, None] + v2[None, :] - vol
    iou = vol / jnp.clip(union, min=1e-8)
    return vol, iou


def boxes3d_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise exact IoU of oriented 9-DoF boxes: (N, 9) x (M, 9) -> (N, M)."""
    return boxes3d_overlap(boxes1, boxes2)[1]


def boxes7d_to_9d(boxes: jax.Array) -> jax.Array:
    """Pad (..., 7) yaw boxes (or (..., 6) axis-aligned) to 9-DoF euler rows."""
    n_extra = 9 - boxes.shape[-1]
    if n_extra == 0:
        return boxes
    pad = jnp.zeros(boxes.shape[:-1] + (n_extra,), dtype=boxes.dtype)
    return jnp.concatenate([boxes, pad], axis=-1)


def axis_aligned_iou3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU of axis-aligned (N, 6)/(M, 6) boxes given as x1y1z1x2y2z2."""
    lt = jnp.maximum(boxes1[:, None, :3], boxes2[None, :, :3])
    rb = jnp.minimum(boxes1[:, None, 3:], boxes2[None, :, 3:])
    whd = jnp.clip(rb - lt, min=0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    v1 = jnp.prod(boxes1[:, 3:] - boxes1[:, :3], axis=-1)
    v2 = jnp.prod(boxes2[:, 3:] - boxes2[:, :3], axis=-1)
    return inter / jnp.clip(v1[:, None] + v2[None, :] - inter, min=1e-8)
