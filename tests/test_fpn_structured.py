"""Structured FPN tables vs a brute-force coordinate oracle.

``fpn_tables`` derives the children subm-conv table, lateral match, and
prune-interpolation corners from the coarse level's 27-neighbor table by
lattice arithmetic (children are ``2p + b`` in parent-major order) —
replacing a 2.4M-row merged sort per FPN level at full scale.

This ALSO fixes a round-3 correctness bug: the former merge-join
implementation (kept as ``fpn_tables_merge``) passed the UNSORTED
parent-major children lattice as a ``lookup_merge`` table, violating that
kernel's key-sorted-table contract (ops/hashing.py lookup_merge: "table
rows are key-ascending — the engine invariant") and silently returning
wrong neighbor rows (audited: ~27% of entries on a 96-parent lattice).
Hence the oracle here is brute force, not the old code path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import embodiedscan_tpu.ops.sparse as S
from embodiedscan_tpu.models.sparse_nn import bneighbor_table, fpn_tables

B, P, C = 3, 96, 6


def _coarse_and_children(seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0, 5, (B, 256, 3)).astype(np.float32)
    feats = rng.randn(B, 256, C).astype(np.float32)
    mask = rng.rand(B, 256) > 0.2
    xc = S.from_points_b(jnp.asarray(pts), jnp.asarray(feats),
                         jnp.asarray(mask), 0.5, P)  # key-sorted invariant
    w = jnp.asarray(rng.randn(8, C, C).astype(np.float32) * 0.1)
    up, _ = jax.vmap(S.generative_transpose2, in_axes=(0, None))(xc, w)
    # lateral: children of some coarse coords (guaranteed matches) plus
    # coords far outside (guaranteed misses), in fine-lattice units
    lat_hit = xc.coords[:, :48] * 2 + jnp.asarray(
        rng.randint(0, 2, (B, 48, 3)), jnp.int32)
    lat_miss = jnp.asarray(rng.randint(200, 300, (B, 16, 3)), jnp.int32)
    lcoords = jnp.concatenate([lat_hit, lat_miss], 1)
    lmask = jnp.concatenate(
        [xc.mask[:, :48], jnp.asarray(rng.rand(B, 16) > 0.5)], 1)
    lateral = S.SparseTensor(
        lcoords, jnp.zeros(lcoords.shape[:2] + (C,), jnp.float32), lmask)
    return xc, up, lateral


@pytest.mark.parametrize('mode', ['flat', 'vmap'])
def test_structured_tables_match_bruteforce(mode):
    xc, up, lateral = _coarse_and_children()
    prev = S.BMAP_MODE
    try:
        S.set_bmap_mode(mode)
        pnbr = bneighbor_table(xc, S.OFFSETS_3)
        nbr, lat, itp = fpn_tables(pnbr, xc.coords, xc.mask, lateral)
    finally:
        S.set_bmap_mode(prev)
    nbr, lat, itp = np.asarray(nbr), np.asarray(lat), np.asarray(itp)
    for i in range(B):
        uc = np.asarray(up.coords[i])
        cm = np.asarray(up.mask[i])
        child_of = {tuple(c): r for r, c in enumerate(uc) if cm[r]}
        pc = np.asarray(xc.coords[i])
        pm = np.asarray(xc.mask[i])
        # children subm table: row j of (p,b) at offset o == the valid
        # child row whose coord equals child+o, else -1
        for r in np.where(cm)[0]:
            for k, off in enumerate(S.OFFSETS_3):
                want = child_of.get(tuple(uc[r] + off), -1)
                assert nbr[i, r, k] == want, (i, r, k)
        # prune-interp corners, PER PARENT: the 8 trilinear corners of c/2
        # are p + b' in the COARSE lattice for every child c = 2p + b
        parent_of = {tuple(c): r for r, c in enumerate(pc) if pm[r]}
        for r in np.where(pm)[0]:
            for j, d in enumerate(S.OFFSETS_2):
                want = parent_of.get(tuple(pc[r] + d), -1)
                assert itp[i, r, j] == want, (i, r, j)
        # lateral match
        lc = np.asarray(lateral.coords[i])
        lm = np.asarray(lateral.mask[i])
        for t in range(lc.shape[0]):
            want = child_of.get(tuple(lc[t]), -1) if lm[t] else -1
            assert lat[i, t] == want, (i, t)


def test_prune_scores_match_trilinear_interp():
    """fpn_prune_scores (per-parent corners + static weight matmul) must
    equal interpolate_trilinear_b at the children lattice."""
    from embodiedscan_tpu.models.sparse_nn import fpn_prune_scores
    rng = np.random.RandomState(7)
    xc, up, _ = _coarse_and_children(seed=7)
    pscores = jnp.asarray(rng.randn(B, P).astype(np.float32))
    pnbr = bneighbor_table(xc, S.OFFSETS_3)
    corner_cols = np.array([np.flatnonzero(
        (S.OFFSETS_3 == d).all(-1))[0] for d in S.OFFSETS_2])
    corner_idx = np.asarray(pnbr)[:, :, corner_cols]
    got = fpn_prune_scores(pscores, xc.mask, jnp.asarray(corner_idx),
                           up.mask)
    idx8 = jnp.repeat(jnp.asarray(corner_idx), 8, axis=1)  # per-child
    want = S.interpolate_trilinear_b(
        S.SparseTensor(xc.coords, pscores[..., None], xc.mask),
        up.coords.astype(jnp.float32) / 2.0, up.mask, idx8)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_end_to_end_fpn_values_finite_and_mode_stable():
    """Head-level forward equivalence across bmap modes (uses the new
    structured tables inside the real FCAF3D FPN)."""
    from embodiedscan_tpu.models.fcaf3d import FCAF3DHead
    rng = np.random.RandomState(3)
    levels = []
    caps = (64, 48, 32, 24)
    chans = (8, 12, 16, 20)
    for cap, ch in zip(caps, chans):
        pts = rng.uniform(0, 6, (2, 128, 3)).astype(np.float32)
        f = rng.randn(2, 128, ch).astype(np.float32)
        m = rng.rand(2, 128) > 0.2
        st = S.from_points_b(jnp.asarray(pts), jnp.asarray(f),
                             jnp.asarray(m), 0.5, cap)
        levels.append(st)
    head = FCAF3DHead(num_classes=4, in_channels=chans, out_channels=16,
                      fpn_capacities=(64, 48, 32, 24), voxel_size=0.05)
    variables = head.init(jax.random.PRNGKey(0), levels, train=False)
    outs = {}
    prev = S.BMAP_MODE
    try:
        for mode in ('vmap', 'flat'):
            S.set_bmap_mode(mode)
            outs[mode] = head.apply(variables, levels, train=False)
    finally:
        S.set_bmap_mode(prev)
    for a, b in zip(jax.tree_util.tree_leaves(outs['vmap']),
                    jax.tree_util.tree_leaves(outs['flat'])):
        assert np.isfinite(np.asarray(a, np.float32)).all()
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)
