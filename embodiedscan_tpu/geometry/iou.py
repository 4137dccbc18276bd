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
    """Exact intersection volume of two (9,) euler boxes.

    Reference (AoS) formulation, kept as the oracle for the shipping SoA
    kernel (:func:`_intersection_volume_flat`) — per-pair (K, 3) vertex
    buffers with scatter compaction lower to ~57x-padded VPU tiles under a
    double vmap (traced 8-15 GB/s, 36 s/step in the grounding match cost).
    """
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


# --- structure-of-arrays kernel: the TPU-shipping path ---------------------
#
# The AoS kernel above keeps each polygon as a (K, 3) buffer, so under
# vmap over pairs every elementwise op runs on (..., K, 3) arrays whose
# minor dims pad to one (8, 128) tile per 36 useful elements, and the
# compaction scatters serialize.  Here the PAIR axis is the minor (lane)
# axis: a polygon is K=(10) slot rows of (B,) lanes per coordinate, the
# six half-space clips run as ONE ``lax.scan`` body (compile stays small:
# one clip body instead of 6 unrolled ones x 2 passes), and scatter
# compaction becomes a one-hot select over the (K_out, K_in) slot matrix
# (each output slot takes from exactly one source slot; positions from a
# prefix sum over the slot axis).  4-gon + 6 convex clips <= 10 vertices.

_MAX_VERTS = 10  # 4-gon + 6 convex clips


def _clip_soa_body(carry, plane):
    """One Sutherland-Hodgman half-space clip on (K, B) slot-row arrays.

    Carry: (vx, vy, vz, cnt) with vx/vy/vz (K, B) vertex coords (first
    ``cnt`` slots valid per lane) and cnt (B,) int32.  Plane: (nx, ny, nz,
    d) each (B,), half-space ``n . p <= d``.
    """
    vx, vy, vz, cnt = carry
    nx, ny, nz, d = plane
    k = vx.shape[0]
    idx = jnp.arange(k)[:, None]  # (K, 1)
    ds = vx * nx + vy * ny + vz * nz - d  # (K, B)
    # successor of slot k is k+1 while k+1 < cnt, else slot 0 (wrap)
    wrap = idx + 1 < cnt
    d_n = jnp.where(wrap, jnp.roll(ds, -1, 0), ds[0])
    x_n = jnp.where(wrap, jnp.roll(vx, -1, 0), vx[0])
    y_n = jnp.where(wrap, jnp.roll(vy, -1, 0), vy[0])
    z_n = jnp.where(wrap, jnp.roll(vz, -1, 0), vz[0])
    cur_in = ds <= 0.0
    nxt_in = d_n <= 0.0
    denom = ds - d_n
    t = ds / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    ivx = vx + t * (x_n - vx)
    ivy = vy + t * (y_n - vy)
    ivz = vz + t * (z_n - vz)
    active = idx < cnt
    e_c = cur_in & active                 # emit current vertex
    e_i = (cur_in != nxt_in) & active     # emit edge-plane intersection
    n_emit = e_c.astype(jnp.int32) + e_i.astype(jnp.int32)
    run = jnp.cumsum(n_emit, axis=0)      # inclusive prefix over slots
    pc = run - n_emit                     # output slot of the current vert
    pi = pc + e_c.astype(jnp.int32)       # output slot of the intersection
    # compaction: out slot o gathers from the unique source slot whose
    # emit position equals o (one-hot over the tiny K x K slot matrix)
    slots = jnp.arange(k)[:, None, None]  # (K_out, 1, 1)
    mc = e_c[None] & (pc[None] == slots)  # (K_out, K_in, B)
    mi = e_i[None] & (pi[None] == slots)
    zero = jnp.zeros_like(vx[None])
    ox = (jnp.where(mc, vx[None], zero) +
          jnp.where(mi, ivx[None], zero)).sum(1)
    oy = (jnp.where(mc, vy[None], zero) +
          jnp.where(mi, ivy[None], zero)).sum(1)
    oz = (jnp.where(mc, vz[None], zero) +
          jnp.where(mi, ivz[None], zero)).sum(1)
    return (ox, oy, oz, jnp.minimum(run[-1], k)), None


def _soa_planes(boxes: jax.Array):
    """(B, 9) -> per-plane SoA: 6 x (nx, ny, nz) and offsets, each (B,)."""
    rot = euler_zxy_to_matrix(boxes[:, 6:9])  # (B, 3, 3), columns = axes
    rt = jnp.moveaxis(rot, 0, -1)  # (3, 3, B): rt[i, j] = R[:, i, j]
    cx, cy, cz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    normals, offsets = [], []
    for j in range(6):
        s = 1.0 if j < 3 else -1.0
        nx, ny, nz = s * rt[0, j % 3], s * rt[1, j % 3], s * rt[2, j % 3]
        half = boxes[:, 3 + j % 3] / 2
        normals.append((nx, ny, nz))
        offsets.append(nx * cx + ny * cy + nz * cz + half)
    return normals, offsets


def _clipped_volume_soa(corners_t: jax.Array, planes):
    """Signed volume of each box's 6 faces clipped by 6 half-spaces (SoA).

    Args:
        corners_t: (8, 3, B) corners of the face-owning boxes.
        planes: (pnx, pny, pnz, pd) each (6, B) — per-lane clipping planes.

    Returns:
        (B,) divergence-theorem volume contribution.
    """
    b = corners_t.shape[-1]
    # fold the 6 faces into the lane axis: lane = f * B + pair
    face = corners_t[_FACE_IDX]  # (6, 4, 3, B)
    init = []
    for c in range(3):
        v = face[:, :, c, :].transpose(1, 0, 2).reshape(4, 6 * b)
        pad = jnp.zeros((_MAX_VERTS - 4, 6 * b), v.dtype)
        init.append(jnp.concatenate([v, pad], 0))
    cnt = jnp.full((6 * b,), 4, jnp.int32)
    tiled = tuple(
        jnp.tile(p[:, None, :], (1, 6, 1)).reshape(6, 6 * b) for p in planes)
    (vx, vy, vz, cnt), _ = jax.lax.scan(
        _clip_soa_body, (init[0], init[1], init[2], cnt), tiled)
    # fan triangulation from slot 0 (degenerate/invalid slots read as the
    # fill value but are masked out by cnt)
    xs = [vx[i] for i in range(_MAX_VERTS)]
    ys = [vy[i] for i in range(_MAX_VERTS)]
    zs = [vz[i] for i in range(_MAX_VERTS)]
    acc = jnp.zeros_like(xs[0])
    for i in range(1, _MAX_VERTS - 1):
        cxp = ys[i] * zs[i + 1] - zs[i] * ys[i + 1]
        cyp = zs[i] * xs[i + 1] - xs[i] * zs[i + 1]
        czp = xs[i] * ys[i + 1] - ys[i] * xs[i + 1]
        det = cxp * xs[0] + cyp * ys[0] + czp * zs[0]
        acc = acc + jnp.where(i + 1 < cnt, det, 0.0)
    return acc.reshape(6, b).sum(0) / 6.0


def _axis_overlap_bound(a: jax.Array, b: jax.Array) -> jax.Array:
    """SAT-style upper bound on pair intersection volume: (B, 9) x 2 -> (B,).

    Along each axis of each box, the intersection's 1D projection lies in
    the overlap of both boxes' projections, so its volume is bounded by the
    product of the three overlap lengths in either frame. Clamping to this
    bound zeroes the spurious contribution of grazing faces when the
    intersection polytope is flat (touching boxes), which the asymmetric
    coplanar-eps rule would otherwise count once.
    """
    ra = euler_zxy_to_matrix(a[:, 6:9])  # (B, 3, 3), columns are axes
    rb = euler_zxy_to_matrix(b[:, 6:9])
    ca, cb = a[:, :3], b[:, :3]
    ha, hb = a[:, 3:6] / 2, b[:, 3:6] / 2

    def frame_bound(axes, c_own, h_own, r_other, c_other, h_other):
        # axes: (B, 3, 3) columns; project both boxes onto each column.
        # Spelled as broadcast-mul-sum, NOT einsum: (B, 3, 3) dot_generals
        # scalarize on TPU (traced 7 GB/s); these are VPU elementwise ops.
        p_own = jnp.sum(c_own[:, :, None] * axes, axis=1)     # (B, 3)
        p_oth = jnp.sum(c_other[:, :, None] * axes, axis=1)
        # support half-width of the other box along each axis
        dots = jnp.abs(jnp.sum(axes[:, :, :, None] * r_other[:, :, None, :],
                               axis=1))                        # (B, 3, 3)
        w_oth = jnp.sum(dots * h_other[:, None, :], axis=-1)
        hi = jnp.minimum(p_own + h_own, p_oth + w_oth)
        lo = jnp.maximum(p_own - h_own, p_oth - w_oth)
        return jnp.prod(jnp.clip(hi - lo, min=0.0), axis=-1)

    return jnp.minimum(frame_bound(ra, ca, ha, rb, cb, hb),
                       frame_bound(rb, cb, hb, ra, ca, ha))


def _intersection_volume_flat(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact intersection volume of aligned box pairs: (B, 9) x 2 -> (B,).

    Both Sutherland-Hodgman passes (faces of ``a`` against planes of ``b``
    and vice versa) fold into one doubled lane axis so the whole kernel is
    a single 6-step scan over 12B lanes.
    """
    import functools as _ft
    nb_ = a.shape[0]
    ca = jnp.moveaxis(box_corners(a), 0, -1)  # (8, 3, B)
    cb = jnp.moveaxis(box_corners(b), 0, -1)
    na, da = _soa_planes(a)
    nb, db = _soa_planes(b)
    # Scale-aware tolerances: keep a's faces that graze b's boundary (float
    # error on coincident faces), but shrink a's half-spaces when clipping
    # b's faces so coplanar faces are counted exactly once.
    scale = 1.0 + _ft.reduce(jnp.maximum,
                             [jnp.abs(x) for x in da + db])
    eps_keep = 1e-5 * scale
    eps_copl = 3e-5 * scale
    corners = jnp.concatenate([ca, cb], -1)  # (8, 3, 2B)
    planes = (
        jnp.stack([jnp.concatenate([nb[j][0], na[j][0]]) for j in range(6)]),
        jnp.stack([jnp.concatenate([nb[j][1], na[j][1]]) for j in range(6)]),
        jnp.stack([jnp.concatenate([nb[j][2], na[j][2]]) for j in range(6)]),
        jnp.stack([jnp.concatenate([db[j] + eps_keep, da[j] - eps_copl])
                   for j in range(6)]),
    )
    vol2 = _clipped_volume_soa(corners, planes)  # (2B,)
    vol = jnp.maximum(vol2[:nb_] + vol2[nb_:], 0.0)
    return jnp.minimum(vol, _axis_overlap_bound(a, b))


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
    n, m = boxes1.shape[0], boxes2.shape[0]
    a = jnp.repeat(boxes1, m, axis=0)
    b = jnp.tile(boxes2, (n, 1))
    vol = _intersection_volume_flat(a, b).reshape(n, m)
    v1 = jnp.abs(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    v2 = jnp.abs(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    union = v1[:, None] + v2[None, :] - vol
    iou = vol / jnp.clip(union, min=1e-8)
    return vol, iou


@functools.partial(jax.jit, static_argnames=('capacity',))
@f32_matmuls
def paired_iou_pruned(boxes1: jax.Array, boxes2: jax.Array,
                      capacity: int) -> jax.Array:
    """Exact IoU of aligned box pairs with SAT pruning: (P, 9) x 2 -> (P,).

    Match-cost IoU profile: of the L*B*Q*G candidate pairs the Hungarian
    cost needs, almost all have ZERO overlap (queries sit across the room
    from the GT). :func:`_axis_overlap_bound` is an upper bound on the
    intersection volume at ~1% of the clip kernel's cost, so pairs whose
    bound is 0 are exactly IoU 0 without clipping. This kernel computes the
    bound for every pair, runs the exact Sutherland-Hodgman kernel only on
    the ``capacity`` pairs with the largest bounds (one flat argsort each
    way — never a sort under vmap), and fills the rest with the exact value
    0. Only approximate when more than ``capacity`` pairs truly overlap, in
    which case the smallest-bound pairs are dropped.

    Intended for no-grad costs (matching); the sorts have no useful VJP.
    """
    p = boxes1.shape[0]
    v1 = jnp.abs(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    v2 = jnp.abs(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    if capacity >= p:
        vol = _intersection_volume_flat(boxes1, boxes2)
        return vol / jnp.clip(v1 + v2 - vol, min=1e-8)
    bound = _axis_overlap_bound(boxes1, boxes2)
    order = jnp.argsort(-bound)  # descending bound, stable
    sel = order[:capacity]
    vol_sel = _intersection_volume_flat(boxes1[sel], boxes2[sel])
    padded = jnp.concatenate(
        [vol_sel, jnp.zeros((p - capacity,), vol_sel.dtype)])
    vol = padded[jnp.argsort(order)]
    return vol / jnp.clip(v1 + v2 - vol, min=1e-8)


@functools.partial(jax.jit, static_argnames=())
@f32_matmuls
def boxes3d_overlap_paired(boxes1: jax.Array, boxes2: jax.Array):
    """Aligned-pair exact overlap: (N, 9) x (N, 9) -> (vol (N,), iou (N,))."""
    vol = _intersection_volume_flat(boxes1, boxes2)
    v1 = jnp.abs(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    v2 = jnp.abs(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    iou = vol / jnp.clip(v1 + v2 - vol, min=1e-8)
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
