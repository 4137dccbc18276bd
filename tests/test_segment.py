"""Scatter-free segment sum + gather custom VJP (ops/segment.py).

This op replaces the XLA scatter-add backward of the fusion image gather —
measured HALF the full train step on v5e (PERF.md r3). Correctness is
pinned against numpy float64 accumulation, and the custom VJP against
jax's autodiff of the plain gather.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodiedscan_tpu.ops.segment import gather_rows, segment_sum_rows


def test_segment_sum_matches_numpy():
    rng = np.random.RandomState(0)
    q, p, c = 5000, 700, 16
    ids = rng.randint(-5, p + 5, q).astype(np.int32)  # incl out-of-range
    vals = rng.randn(q, c).astype(np.float32)
    got = np.asarray(segment_sum_rows(jnp.asarray(ids), jnp.asarray(vals), p))
    want = np.zeros((p, c), np.float64)
    for i in range(q):
        if 0 <= ids[i] < p:
            want[ids[i]] += vals[i]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_segment_sum_empty_and_dense():
    # every row to one segment; and no rows at all
    vals = jnp.ones((64, 4), jnp.float32)
    out = segment_sum_rows(jnp.zeros((64,), jnp.int32), vals, 8)
    np.testing.assert_allclose(np.asarray(out[0]), 64.0)
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)
    out = segment_sum_rows(jnp.full((64,), 99, jnp.int32), vals, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_gather_rows_grad_matches_autodiff():
    rng = np.random.RandomState(1)
    p, q, c = 300, 900, 8
    table = jnp.asarray(rng.randn(p, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, p, q).astype(np.int32))
    cot = jnp.asarray(rng.randn(q, c).astype(np.float32))

    def f_custom(t):
        return jnp.vdot(gather_rows(t, idx), cot)

    def f_plain(t):
        return jnp.vdot(t[idx], cot)

    g_custom = jax.grad(f_custom)(table)
    g_plain = jax.grad(f_plain)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-4, atol=1e-5)


def test_batched_fusion_matches_per_sample():
    from embodiedscan_tpu.models.fusion import (point_image_sample,
                                                point_image_sample_batched)
    rng = np.random.RandomState(2)
    bi, s, v, n, hf, wf, c = 2, 2, 3, 50, 8, 8, 4
    h_pad, w_pad = 32, 32
    points = rng.uniform(-1, 3, (bi, s, n, 3)).astype(np.float32)
    pmask = rng.rand(bi, s, n) > 0.1
    feats = rng.randn(bi, v, hf, wf, c).astype(np.float32)
    k = np.array([[20.0, 0, 16, 0], [0, 20, 16, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    proj = np.zeros((bi, v, 4, 4), np.float32)
    for b in range(bi):
        for vv in range(v):
            ext = np.eye(4, dtype=np.float32)
            ext[:3, 3] = [-1 + 0.2 * vv, -1, 4 + b]
            proj[b, vv] = k @ ext
    aug = np.tile(np.eye(4, dtype=np.float32), (bi, 1, 1))
    vmask = rng.rand(bi, s, v) > 0.2

    for mode in ('nearest', 'bilinear'):
        batched = point_image_sample_batched(
            jnp.asarray(points), jnp.asarray(pmask), jnp.asarray(feats),
            jnp.asarray(proj), jnp.asarray(aug), (h_pad, w_pad), mode,
            jnp.asarray(vmask))
        for b in range(bi):
            for ss in range(s):
                ref = point_image_sample(
                    jnp.asarray(points[b, ss]), jnp.asarray(pmask[b, ss]),
                    jnp.asarray(feats[b]), jnp.asarray(proj[b]),
                    jnp.asarray(aug[b]), (h_pad, w_pad), mode,
                    jnp.asarray(vmask[b, ss]))
                np.testing.assert_allclose(np.asarray(batched[b, ss]),
                                           np.asarray(ref), rtol=1e-5,
                                           atol=1e-5, err_msg=mode)


def test_batched_fusion_grad_matches_per_sample():
    from embodiedscan_tpu.models.fusion import (point_image_sample,
                                                point_image_sample_batched)
    rng = np.random.RandomState(3)
    bi, s, v, n, hf, wf, c = 1, 1, 2, 30, 6, 6, 4
    h_pad, w_pad = 24, 24
    points = rng.uniform(-1, 3, (bi, s, n, 3)).astype(np.float32)
    pmask = np.ones((bi, s, n), bool)
    feats = rng.randn(bi, v, hf, wf, c).astype(np.float32)
    k = np.array([[15.0, 0, 12, 0], [0, 15, 12, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    proj = np.tile(k[None, None], (bi, v, 1, 1)).copy()
    proj[0, 1, 0, 3] = 5.0
    aug = np.tile(np.eye(4, dtype=np.float32), (bi, 1, 1))
    vmask = np.ones((bi, s, v), bool)

    def loss_b(f):
        out = point_image_sample_batched(
            jnp.asarray(points), jnp.asarray(pmask), f, jnp.asarray(proj),
            jnp.asarray(aug), (h_pad, w_pad), 'bilinear', jnp.asarray(vmask))
        return jnp.sum(out ** 2)

    def loss_p(f):
        out = point_image_sample(
            jnp.asarray(points[0, 0]), jnp.asarray(pmask[0, 0]), f[0],
            jnp.asarray(proj[0]), jnp.asarray(aug[0]), (h_pad, w_pad),
            'bilinear', jnp.asarray(vmask[0, 0]))
        return jnp.sum(out ** 2)

    g_b = jax.grad(loss_b)(jnp.asarray(feats))
    g_p = jax.grad(loss_p)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_p), rtol=1e-4,
                               atol=1e-5)


def test_batched_fusion_chunked_gather_matches_single():
    """Shrinking GATHER_CHUNK_ROWS forces the multi-chunk gather path; the
    output (and gradient) must be identical to the single-gather path."""
    from embodiedscan_tpu.models import fusion as F
    rng = np.random.RandomState(5)
    bi, s, v, n, hf, wf, c = 2, 1, 2, 40, 6, 6, 3
    h_pad, w_pad = 24, 24
    points = rng.uniform(-1, 3, (bi, s, n, 3)).astype(np.float32)
    pmask = rng.rand(bi, s, n) > 0.1
    feats = rng.randn(bi, v, hf, wf, c).astype(np.float32)
    k = np.array([[15.0, 0, 12, 0], [0, 15, 12, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    proj = np.tile(k[None, None], (bi, v, 1, 1)).copy()
    proj[:, 1, 0, 3] = 3.0
    aug = np.tile(np.eye(4, dtype=np.float32), (bi, 1, 1))
    vmask = np.ones((bi, s, v), bool)
    args = (jnp.asarray(points), jnp.asarray(pmask), jnp.asarray(feats),
            jnp.asarray(proj), jnp.asarray(aug), (h_pad, w_pad))

    def loss(f, mode):
        return jnp.sum(
            F.point_image_sample_batched(args[0], args[1], f, args[3],
                                         args[4], args[5], mode,
                                         jnp.asarray(vmask)) ** 2)

    old = F.GATHER_CHUNK_ROWS
    for mode in ('nearest', 'bilinear'):
        single = F.point_image_sample_batched(*args, mode,
                                              jnp.asarray(vmask))
        g_single = jax.grad(lambda f: loss(f, mode))(args[2])
        try:
            F.GATHER_CHUNK_ROWS = 37  # rows = bi*s*v*n = 160 -> 5 chunks
            chunked = F.point_image_sample_batched(*args, mode,
                                                   jnp.asarray(vmask))
            g_chunked = jax.grad(lambda f: loss(f, mode))(args[2])
        finally:
            F.GATHER_CHUNK_ROWS = old
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(single),
                                   rtol=1e-6, atol=1e-6, err_msg=mode)
        np.testing.assert_allclose(np.asarray(g_chunked),
                                   np.asarray(g_single), rtol=1e-5,
                                   atol=1e-6, err_msg=mode)
