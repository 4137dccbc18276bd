"""Multi-view point-image feature fusion (TPU-native grid_sample equivalent).

Replaces the reference's per-sample/per-level/per-view Python loop around
``F.grid_sample`` (``models/layers/fusion_layers/point_fusion.py:208-315``
``batch_point_sample`` and the detector loop
``sparse_featfusion_single_stage.py:142-207``) with one vectorized gather:
project every 3D point into every view, sample the feature map, and average
over valid views. Augmentation undo (``apply_3d_transformation`` with
reverse=True) is a single 4x4 matrix here because every reference aug op
(flip/rot/scale/trans) is linear.
"""

import jax
import jax.numpy as jnp

from ..geometry.projection import batch_points_cam2img
from ..utils.precision import f32_matmuls

# single >2M-row gathers degrade ~3x on v5e (11 vs 2.5-4 ns/row, PERF.md);
# flat fusion gathers are split into pieces of at most this many rows
# (module-level so tests can shrink it to exercise the chunked path)
GATHER_CHUNK_ROWS = 1 << 20


@f32_matmuls
def point_image_sample(points: jax.Array, point_mask: jax.Array,
                       img_feats: jax.Array, proj: jax.Array,
                       aug_inv: jax.Array, pad_hw: tuple,
                       mode: str = 'nearest',
                       view_mask: jax.Array | None = None) -> jax.Array:
    """Sample per-point image features from all views of one sample.

    Args:
        points: (N, 3) world-frame (DEPTH) points.
        point_mask: (N,) validity.
        img_feats: (V, Hf, Wf, C) per-view feature maps (NHWC).
        proj: (V, 4, 4) intrinsic @ extrinsic matrices.
        aug_inv: (4, 4) inverse of the train-time 3D augmentation.
        pad_hw: static (H_pad, W_pad) of the network input images.
        mode: 'nearest' (reference ``aligned=False``) or 'bilinear'.
        view_mask: optional (V,) validity of views — the continuous
            (streaming) variants mask out future views instead of slicing
            (embodied_det3d.py:109-160's ``[:idx + 1]`` pseudo-batch).

    Returns:
        (N, C) mean of valid per-view samples (zeros where no view sees the
        point), matching batch_point_sample's valid-mean
        (point_fusion.py:296-309).
    """
    v, hf, wf, c = img_feats.shape
    h_pad, w_pad = pad_hw
    ones = jnp.ones_like(points[:, :1])
    pts = jnp.concatenate([points, ones], -1) @ aug_inv.T
    pts = jnp.broadcast_to(pts[None, :, :3], (v,) + points.shape)
    uvd = batch_points_cam2img(pts, proj, with_depth=True)  # (V, N, 3)
    u, w_, d = uvd[..., 0], uvd[..., 1], uvd[..., 2]
    coor_x, coor_y, depth = u, w_, d

    valid = (coor_x > 0) & (coor_x < w_pad) & (coor_y > 0) & \
        (coor_y < h_pad) & (depth > 0) & point_mask[None, :]
    if view_mask is not None:
        valid = valid & view_mask[:, None]

    # grid_sample(align_corners=True) pixel mapping: x_f = u / W_pad * (Wf-1)
    xf = coor_x / w_pad * (wf - 1)
    yf = coor_y / h_pad * (hf - 1)

    # one flat row-gather over all views: batched (per-view) gathers lower
    # to slower per-batch loops on TPU, a single (V*N,)-index gather streams
    flat = img_feats.reshape(v * hf * wf, c)
    vbase = (jnp.arange(v, dtype=jnp.int32) * (hf * wf))[:, None]

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, hf - 1)
        xi = jnp.clip(xi, 0, wf - 1)
        idx = vbase + yi * wf + xi  # (V, N)
        n = idx.shape[1]
        # gather in the feature dtype (bf16 rows are half the bytes), then
        # upcast — exact for bf16->f32; view-mean accumulates in f32
        return flat[idx.reshape(-1)].reshape(v, n, c).astype(jnp.float32)

    if mode == 'nearest':
        sampled = gather(jnp.round(yf).astype(jnp.int32),
                         jnp.round(xf).astype(jnp.int32))
    else:  # bilinear with zero padding outside
        x0 = jnp.floor(xf).astype(jnp.int32)
        y0 = jnp.floor(yf).astype(jnp.int32)
        tx = (xf - x0)[..., None]
        ty = (yf - y0)[..., None]

        def inb(yi, xi):
            return ((yi >= 0) & (yi < hf) & (xi >= 0) &
                    (xi < wf)).astype(jnp.float32)[..., None]

        sampled = (
            gather(y0, x0) * inb(y0, x0) * (1 - tx) * (1 - ty) +
            gather(y0, x0 + 1) * inb(y0, x0 + 1) * tx * (1 - ty) +
            gather(y0 + 1, x0) * inb(y0 + 1, x0) * (1 - tx) * ty +
            gather(y0 + 1, x0 + 1) * inb(y0 + 1, x0 + 1) * tx * ty)

    sampled = jnp.where(valid[..., None], sampled, 0)
    cnt = jnp.sum(valid, axis=0)  # (N,)
    total = jnp.sum(sampled, axis=0)  # (N, C)
    out = total / jnp.clip(cnt, min=1)[:, None]
    return jnp.where((cnt > 0)[:, None] & point_mask[:, None], out, 0)


@f32_matmuls
def point_image_sample_batched(points: jax.Array, point_mask: jax.Array,
                               img_feats: jax.Array, proj: jax.Array,
                               aug_inv: jax.Array, pad_hw: tuple,
                               mode: str = 'nearest',
                               view_mask: jax.Array | None = None
                               ) -> jax.Array:
    """Whole-batch fusion: same math as :func:`point_image_sample`, ONE
    flat feature gather for all (scan, sweep, view, point) tuples.

    The per-sample variant under ``jax.vmap`` autodiffs its image-feature
    gather into a batched scatter-add — measured 180 ms/step at full scale
    on v5e, HALF the train step (r3 trace). Here the gather is a single
    flat :func:`ops.segment.gather_rows` whose custom VJP is a sort-based
    segment sum (~25 ms), and everything else is batched elementwise math.

    Args:
        points: (BI, S, N, 3) world points (S sweeps share a scan's views).
        point_mask: (BI, S, N).
        img_feats: (BI, V, Hf, Wf, C).
        proj: (BI, V, 4, 4); aug_inv: (BI, 4, 4); view_mask: (BI, S, V).
        pad_hw: static network input (H_pad, W_pad).

    Returns:
        (BI, S, N, C) valid-view means.
    """
    from ..geometry.projection import _pad_to_4x4
    from ..ops.segment import gather_rows
    bi, v, hf, wf, c = img_feats.shape
    s, n = points.shape[1:3]
    h_pad, w_pad = pad_hw
    proj = _pad_to_4x4(proj)
    ones = jnp.ones_like(points[..., :1])
    pts = jnp.einsum('bsni,bji->bsnj',
                     jnp.concatenate([points, ones], -1), aug_inv)
    pts = jnp.concatenate([pts[..., :3], ones], -1)
    # project into every view: (BI, S, V, N, 3) u, v, depth
    uvw = jnp.einsum('bsnj,bvkj->bsvnk', pts, proj)
    depth = uvw[..., 2]
    uv = uvw[..., :2] / jnp.clip(depth[..., None], min=1e-3)
    coor_x, coor_y = uv[..., 0], uv[..., 1]

    valid = (coor_x > 0) & (coor_x < w_pad) & (coor_y > 0) & \
        (coor_y < h_pad) & (depth > 0) & point_mask[:, :, None, :]
    if view_mask is not None:
        valid = valid & view_mask[:, :, :, None]

    xf = coor_x / w_pad * (wf - 1)
    yf = coor_y / h_pad * (hf - 1)

    flat = img_feats.reshape(bi * v * hf * wf, c)
    # global row base per (scan, view), broadcast over sweeps/points
    vbase = (jnp.arange(bi * v, dtype=jnp.int32) *
             (hf * wf)).reshape(bi, 1, v, 1)

    # chunk the flat gather so each piece stays in the fast regime (b=2
    # full scale: 2M rows -> 2x ~1M chunks)
    _CHUNK = GATHER_CHUNK_ROWS

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, hf - 1)
        xi = jnp.clip(xi, 0, wf - 1)
        # out-of-frustum pairs read row 0: their output is zeroed below
        # (and their cotangent is zero), but a constant index keeps the
        # wasted HBM reads page-local instead of scattered
        idx = jnp.where(valid, vbase + yi * wf + xi, 0).reshape(-1)
        rows = idx.shape[0]
        if rows <= _CHUNK:
            out = gather_rows(flat, idx)
        else:
            nch = -(-rows // _CHUNK)
            csz = -(-rows // nch)
            out = jnp.concatenate([
                gather_rows(flat, idx[i * csz:(i + 1) * csz])
                for i in range(nch)
            ])
        # upcast AFTER the gather: bf16 feature rows move half the bytes
        # through the gather (and its segment-sum backward accumulates in
        # f32 regardless — ops/segment.py); bf16->f32 is exact
        return out.reshape(bi, s, v, n, c).astype(jnp.float32)

    if mode == 'nearest':
        sampled = gather(jnp.round(yf).astype(jnp.int32),
                         jnp.round(xf).astype(jnp.int32))
    else:  # bilinear with zero padding outside
        x0 = jnp.floor(xf).astype(jnp.int32)
        y0 = jnp.floor(yf).astype(jnp.int32)
        tx = (xf - x0)[..., None]
        ty = (yf - y0)[..., None]

        def inb(yi, xi):
            return ((yi >= 0) & (yi < hf) & (xi >= 0) &
                    (xi < wf)).astype(jnp.float32)[..., None]

        sampled = (
            gather(y0, x0) * inb(y0, x0) * (1 - tx) * (1 - ty) +
            gather(y0, x0 + 1) * inb(y0, x0 + 1) * tx * (1 - ty) +
            gather(y0 + 1, x0) * inb(y0 + 1, x0) * (1 - tx) * ty +
            gather(y0 + 1, x0 + 1) * inb(y0 + 1, x0 + 1) * tx * ty)

    sampled = jnp.where(valid[..., None], sampled, 0)
    cnt = jnp.sum(valid, axis=2)  # (BI, S, N)
    total = jnp.sum(sampled, axis=2)  # (BI, S, N, C)
    out = total / jnp.clip(cnt, min=1)[..., None]
    return jnp.where((cnt > 0)[..., None] & point_mask[..., None], out, 0)
