"""Camera <-> image projection helpers (pure JAX).

Mirrors reference ``embodiedscan/structures/bbox_3d/utils.py:244-416``
(``points_cam2img``, ``batch_points_cam2img``, ``points_img2cam``) with
batched, jit-friendly implementations.
"""

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls


def _pad_to_4x4(mat: jax.Array) -> jax.Array:
    """Embed a (..., r<=4, c<=4) projection matrix into (..., 4, 4) identity."""
    r, c = mat.shape[-2:]
    if (r, c) == (4, 4):
        return mat
    eye = jnp.broadcast_to(jnp.eye(4, dtype=mat.dtype), mat.shape[:-2] + (4, 4))
    return eye.at[..., :r, :c].set(mat)


@f32_matmuls
def points_cam2img(points_3d: jax.Array, proj_mat: jax.Array,
                   with_depth: bool = False) -> jax.Array:
    """Project (..., 3) camera-frame points to image plane via (r, c) proj_mat."""
    proj = _pad_to_4x4(proj_mat)
    ones = jnp.ones_like(points_3d[..., :1])
    pts4 = jnp.concatenate([points_3d, ones], axis=-1)
    pt2d = pts4 @ proj.T
    res = pt2d[..., :2] / pt2d[..., 2:3]
    if with_depth:
        res = jnp.concatenate([res, pt2d[..., 2:3]], axis=-1)
    return res


@f32_matmuls
def batch_points_cam2img(points_3d: jax.Array, proj_mat: jax.Array,
                         with_depth: bool = False) -> jax.Array:
    """Batched projection: (V, N, 3) points by (V, 4, 4) matrices -> (V, N, 2|3).

    Depth is clamped at 1e-3 before division as in the reference
    (``utils.py:290-334``), so behind-camera points do not blow up.
    """
    proj = _pad_to_4x4(proj_mat)
    ones = jnp.ones_like(points_3d[..., :1])
    pts4 = jnp.concatenate([points_3d, ones], axis=-1)
    pt2d = jnp.einsum('vnj,vkj->vnk', pts4, proj)
    res = pt2d[..., :2] / jnp.clip(pt2d[..., 2:3], min=1e-3)
    if with_depth:
        res = jnp.concatenate([res, pt2d[..., 2:3]], axis=-1)
    return res


@f32_matmuls
def points_img2cam(points: jax.Array, cam2img: jax.Array) -> jax.Array:
    """Back-project (..., 3) image points (u, v, depth) into camera frame."""
    xys = points[..., :2]
    depths = points[..., 2:3]
    unnormed = jnp.concatenate([xys * depths, depths], axis=-1)
    pad = _pad_to_4x4(cam2img)
    inv = jnp.linalg.inv(pad)
    ones = jnp.ones_like(depths)
    homo = jnp.concatenate([unnormed, ones], axis=-1)
    return (homo @ inv.T)[..., :3]


def get_lidar2img(cam2img: jax.Array, lidar2cam: jax.Array) -> jax.Array:
    """Compose intrinsic and extrinsic into a single 4x4 projection."""
    return _pad_to_4x4(cam2img) @ _pad_to_4x4(lidar2cam)
