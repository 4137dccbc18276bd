"""Functional 9-DoF Euler box operations (pure JAX, static shapes).

A box is a row ``(x, y, z, dx, dy, dz, alpha, beta, gamma)`` with ZXY euler
angles, gravity-centered origin (0.5, 0.5, 0.5) — the layout of the reference
``EulerInstance3DBoxes`` (``embodiedscan/structures/bbox_3d/euler_box3d.py:12``).
Instead of a mutable class, every op is a function ``(..., 9) -> (...)`` that
vmaps/jits cleanly; padded rows are handled by carrying an external mask.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import f32_matmuls

from .rotations import (euler_zxy_to_matrix, matrix_to_euler_zxy,
                        rotation_3d_in_euler)

# Corner ordering of the reference (euler_box3d.py:66-101):
# unravel_index(arange(8), [2,2,2]) reordered by [0,1,3,2,4,5,7,6] then
# shifted by the (.5,.5,.5) origin:
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0).
_CORNERS_NORM = np.stack(np.unravel_index(np.arange(8), [2] * 3),
                         axis=1)[[0, 1, 3, 2, 4, 5, 7, 6]].astype(np.float32) - 0.5


@f32_matmuls
def corners(boxes: jax.Array) -> jax.Array:
    """(..., 9) boxes -> (..., 8, 3) corners in the reference's clockwise order."""
    dims = boxes[..., 3:6]
    ctr = boxes[..., :3]
    norm = jnp.asarray(_CORNERS_NORM, dtype=boxes.dtype)
    local = dims[..., None, :] * norm  # (..., 8, 3)
    rotated = rotation_3d_in_euler(local, boxes[..., 6:9])
    return rotated + ctr[..., None, :]


def volume(boxes: jax.Array) -> jax.Array:
    """(..., 9) -> (...) box volumes."""
    return boxes[..., 3] * boxes[..., 4] * boxes[..., 5]


def gravity_center(boxes: jax.Array) -> jax.Array:
    """(..., 9) -> (..., 3). Euler boxes are already gravity-centered."""
    return boxes[..., :3]


@f32_matmuls
def transform(boxes: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply a rigid 4x4 (or rotation-only 3x3) transform to boxes.

    Composes the rotation with each box's euler matrix and re-extracts ZXY
    angles, mirroring ``EulerInstance3DBoxes.transform``
    (euler_box3d.py:190-213).
    """
    if matrix.shape[-1] == 3:
        rot = matrix
        trans = jnp.zeros((3,), dtype=boxes.dtype)
    else:
        rot = matrix[..., :3, :3]
        trans = matrix[..., :3, 3]
    center = boxes[..., :3] @ rot.T + trans
    size = boxes[..., 3:6]
    ori = euler_zxy_to_matrix(boxes[..., 6:9])
    final = rot @ ori
    angles = matrix_to_euler_zxy(final)
    return jnp.concatenate([center, size, angles], axis=-1)


def rotate(boxes: jax.Array, rot_mat: jax.Array) -> jax.Array:
    """Rotate boxes by a 3x3 rotation matrix (euler_box3d.py:215-259)."""
    return transform(boxes, rot_mat)


def scale(boxes: jax.Array, factor) -> jax.Array:
    """Scale centers and sizes by a scalar factor (euler_box3d.py:261-267)."""
    return jnp.concatenate([boxes[..., :6] * factor, boxes[..., 6:9]], axis=-1)


def translate(boxes: jax.Array, trans: jax.Array) -> jax.Array:
    """Shift box centers by (3,) translation."""
    return boxes.at[..., :3].add(trans)


def flip(boxes: jax.Array, direction: str = 'X') -> jax.Array:
    """Mirror boxes along a coordinate plane (euler_box3d.py:269-289).

    direction='X' flips the x coordinate (the reference's
    ``bev_direction='horizontal'`` flip for depth boxes).
    """
    x, y, z = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    a, b, g = boxes[..., 6], boxes[..., 7], boxes[..., 8]
    if direction == 'X':
        x, a, g = -x, -a + jnp.pi, -g
    elif direction == 'Y':
        y, a, b = -y, -a, -b + jnp.pi
    elif direction == 'Z':
        z, b, g = -z, -b, -g + jnp.pi
    else:
        raise ValueError(direction)
    return jnp.concatenate(
        [jnp.stack([x, y, z], -1), boxes[..., 3:6],
         jnp.stack([a, b, g], -1)], axis=-1)


@f32_matmuls
def points_in_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """(N, 3) points x (M, 9) boxes -> (N, M) bool containment mask.

    A point is inside if its box-frame coordinates are within the half-dims.
    """
    rot = euler_zxy_to_matrix(boxes[..., 6:9])  # (M, 3, 3)
    rel = points[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    local = jnp.einsum('nmj,mjk->nmk', rel, rot)  # R^T maps world->local: rel @ R
    half = boxes[None, :, 3:6] / 2
    return jnp.all(jnp.abs(local) <= half, axis=-1)


@f32_matmuls
def face_distances(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """Distances from points to the 6 faces of rotated boxes.

    Args:
        points: (N, 3).
        boxes: (M, 9) gravity-centered boxes.

    Returns:
        (N, M, 6): (dx_min, dx_max, dy_min, dy_max, dz_min, dz_max), matching
        ``FCAF3DHead._get_face_distances`` (fcaf3d_head.py:1537-1566): positive
        everywhere iff the point is inside the box.
    """
    shift = points[:, None, :] - boxes[None, :, :3]  # (N, M, 3)
    # reference rotates the shift by -euler angles: shift @ R(-angles)^T
    rot = euler_zxy_to_matrix(-boxes[..., 6:9])  # (M, 3, 3)
    local = jnp.einsum('nmj,mkj->nmk', shift, rot)
    half = boxes[None, :, 3:6] / 2
    d_min = local + half  # distance to min faces
    d_max = half - local  # distance to max faces
    return jnp.stack(
        [d_min[..., 0], d_max[..., 0], d_min[..., 1], d_max[..., 1],
         d_min[..., 2], d_max[..., 2]], axis=-1)
