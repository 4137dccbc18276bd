"""Sparse voxel engine tests against dense numpy oracles."""

import numpy as np

import jax
import jax.numpy as jnp

from embodiedscan_tpu.ops import hashing as H
from embodiedscan_tpu.ops import sparse as S


def make_random_sparse(rng, n_occ, extent, c, capacity):
    """Random occupied voxel set (unique coords) + features."""
    coords = rng.randint(-extent, extent, size=(n_occ * 2, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)[:n_occ]
    n = coords.shape[0]
    feats = rng.randn(n, c).astype(np.float32)
    pad = capacity - n
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, c), np.float32)])
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    st = S.SparseTensor(jnp.asarray(coords_p), jnp.asarray(feats_p),
                        jnp.asarray(mask))
    return st, coords, feats


class TestHashing:

    def test_unique_and_lookup(self):
        rng = np.random.RandomState(0)
        coords = rng.randint(-10, 10, size=(64, 3)).astype(np.int32)
        mask = np.ones(64, bool)
        mask[50:] = False
        uniq = H.unique_coords(jnp.asarray(coords), jnp.asarray(mask), 128)
        want = np.unique(coords[:50], axis=0)
        got_mask = np.asarray(uniq.mask)
        got = np.asarray(uniq.coords)[got_mask]
        assert int(uniq.count) == len(want)
        np.testing.assert_array_equal(
            got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])])
        # inverse maps every valid row to a slot holding its coord
        inv = np.asarray(uniq.inverse)
        for i in range(50):
            np.testing.assert_array_equal(np.asarray(uniq.coords)[inv[i]],
                                          coords[i])
        assert (inv[50:] == -1).all()

    def test_lookup_hit_and_miss(self):
        coords = jnp.asarray([[0, 0, 0], [1, 2, 3], [-5, 4, 2]], jnp.int32)
        mask = jnp.ones(3, bool)
        table = H.build_hash(coords, mask)
        q = jnp.asarray([[1, 2, 3], [9, 9, 9], [0, 0, 0]], jnp.int32)
        idx = np.asarray(H.lookup(table, q))
        assert idx[0] == 1 and idx[1] == -1 and idx[2] == 0

    def test_capacity_overflow_drops(self):
        coords = np.arange(30).reshape(10, 3).astype(np.int32)
        uniq = H.unique_coords(jnp.asarray(coords), jnp.ones(10, bool), 4)
        assert int(np.asarray(uniq.mask).sum()) == 4
        inv = np.asarray(uniq.inverse)
        assert (inv >= -1).all() and (inv < 4).all()


class TestVoxelize:

    def test_from_points_first_occurrence(self):
        pts = jnp.asarray([[0.05, 0.05, 0.05], [0.01, 0.02, 0.03],
                           [0.15, 0.05, 0.05]])
        feats = jnp.asarray([[1.0], [2.0], [3.0]])
        st = S.from_points(pts, feats, jnp.ones(3, bool), 0.1, 8)
        m = np.asarray(st.mask)
        assert m.sum() == 2
        coords = np.asarray(st.coords)[m]
        f = np.asarray(st.feats)[m]
        row0 = np.where((coords == [0, 0, 0]).all(1))[0][0]
        row1 = np.where((coords == [1, 0, 0]).all(1))[0][0]
        assert f[row0, 0] == 1.0  # first point in the voxel wins
        assert f[row1, 0] == 3.0


def dense_from_sparse(coords, feats, extent, c):
    side = 2 * extent + 1
    vol = np.zeros((side, side, side, c), np.float32)
    for cc, ff in zip(coords, feats):
        vol[tuple(cc + extent)] = ff
    return vol


class TestConv:

    def test_subm_conv_matches_dense(self):
        rng = np.random.RandomState(1)
        extent, cin, cout, cap = 5, 4, 6, 128
        st, coords, feats = make_random_sparse(rng, 40, extent, cin, cap)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
        out = S.subm_conv(st, jnp.asarray(w))
        vol = dense_from_sparse(coords, feats, extent + 1, cin)
        got = np.asarray(out.feats)
        m = np.asarray(out.mask)
        for i in range(len(coords)):
            acc = np.zeros(cout, np.float32)
            for k, off in enumerate(S.OFFSETS_3):
                q = coords[i] + off + extent + 1
                acc += vol[tuple(q)] @ w[k]
            np.testing.assert_allclose(got[i], acc, atol=1e-4)
        assert (got[~m] == 0).all()

    def test_strided_conv_matches_dense(self):
        rng = np.random.RandomState(2)
        extent, cin, cout, cap = 5, 3, 5, 128
        st, coords, feats = make_random_sparse(rng, 40, extent, cin, cap)
        dmap = S.downsample_coords(st, 64)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
        out = S.strided_conv(st, dmap, jnp.asarray(w))
        vol = dense_from_sparse(coords, feats, 2 * extent + 2, cin)
        want_coords = np.unique(coords // 2, axis=0)
        m = np.asarray(out.mask)
        got_coords = np.asarray(out.coords)[m]
        assert sorted(map(tuple, got_coords)) == sorted(map(tuple, want_coords))
        got = np.asarray(out.feats)
        for j in np.where(m)[0]:
            o = np.asarray(out.coords)[j]
            acc = np.zeros(cout, np.float32)
            for k, off in enumerate(S.OFFSETS_3):
                q = 2 * o + off + 2 * extent + 2
                acc += vol[tuple(q)] @ w[k]
            np.testing.assert_allclose(got[j], acc, atol=1e-4)

    def test_maxpool_matches_oracle(self):
        rng = np.random.RandomState(3)
        extent, c, cap = 4, 3, 64
        st, coords, feats = make_random_sparse(rng, 30, extent, c, cap)
        dmap = S.downsample_coords(st, 32)
        out = S.maxpool2(st, dmap)
        m = np.asarray(out.mask)
        got = np.asarray(out.feats)
        oc = np.asarray(out.coords)
        for j in np.where(m)[0]:
            members = [feats[i] for i in range(len(coords))
                       if (coords[i] // 2 == oc[j]).all()]
            want = np.max(np.stack(members), axis=0)
            np.testing.assert_allclose(got[j], want, atol=1e-5)

    def test_generative_transpose(self):
        rng = np.random.RandomState(4)
        cin, cout = 3, 4
        coords = np.array([[0, 0, 0], [2, -1, 1]], np.int32)
        feats = rng.randn(2, cin).astype(np.float32)
        st = S.SparseTensor(
            jnp.asarray(np.concatenate([coords, np.zeros((2, 3), np.int32)])),
            jnp.asarray(np.concatenate([feats, np.zeros((2, cin),
                                                        np.float32)])),
            jnp.asarray([True, True, False, False]))
        w = rng.randn(8, cin, cout).astype(np.float32)
        out, parent = S.generative_transpose2(st, jnp.asarray(w))
        m = np.asarray(out.mask)
        assert m.sum() == 16
        got = np.asarray(out.feats)
        oc = np.asarray(out.coords)
        for j in np.where(m)[0]:
            p = np.asarray(parent)[j]
            off = oc[j] - 2 * coords[p]
            k = np.where((S.OFFSETS_2 == off).all(1))[0][0]
            np.testing.assert_allclose(got[j], feats[p] @ w[k], atol=1e-4)

    def test_scatter_sum_into(self):
        coords = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 0]], jnp.int32)
        dst = S.SparseTensor(coords[:2], jnp.asarray([[1.0], [2.0]]),
                             jnp.ones(2, bool))
        src = S.SparseTensor(
            jnp.asarray([[1, 0, 0], [5, 5, 5]], jnp.int32),
            jnp.asarray([[10.0], [100.0]]), jnp.ones(2, bool))
        out = S.scatter_sum_into(dst, src)
        np.testing.assert_allclose(np.asarray(out.feats), [[1.0], [12.0]])

    def test_topk_select(self):
        st = S.SparseTensor(
            jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]],
                        jnp.int32),
            jnp.asarray([[1.0], [2.0], [3.0], [4.0]]),
            jnp.asarray([True, True, True, False]))
        scores = jnp.asarray([0.5, 0.9, 0.1, 99.0])
        out = S.topk_select(st, scores, 2)
        got = np.asarray(out.coords)
        # top-2 valid by score = {[0,0,0], [1,0,0]}, re-sorted by coord key
        np.testing.assert_array_equal(got, [[0, 0, 0], [1, 0, 0]])
        assert np.asarray(out.mask).all()

    def test_to_dense(self):
        st = S.SparseTensor(
            jnp.asarray([[0, 0, 0], [1, 2, 3]], jnp.int32),
            jnp.asarray([[1.0], [2.0]]), jnp.ones(2, bool))
        vol = S.to_dense(st, jnp.asarray([0, 0, 0]), (2, 3, 4))
        assert vol.shape == (2, 3, 4, 1)
        assert vol[0, 0, 0, 0] == 1.0 and vol[1, 2, 3, 0] == 2.0
        assert float(jnp.sum(vol)) == 3.0

    def test_interpolate_trilinear(self):
        # features f(x) = x over a line of voxels -> interpolation is linear
        coords = jnp.asarray([[i, 0, 0] for i in range(4)], jnp.int32)
        feats = jnp.asarray([[float(i)] for i in range(4)])
        st = S.SparseTensor(coords, feats, jnp.ones(4, bool))
        q = jnp.asarray([[1.5, 0.0, 0.0], [2.25, 0.0, 0.0]])
        out = np.asarray(
            S.interpolate_trilinear(st, q, jnp.ones(2, bool)))
        np.testing.assert_allclose(out[:, 0], [1.5, 2.25], atol=1e-5)

    def test_conv1x1_strided(self):
        rng = np.random.RandomState(5)
        st, coords, feats = make_random_sparse(rng, 20, 4, 3, 64)
        dmap = S.downsample_coords(st, 32)
        w = rng.randn(1, 3, 2).astype(np.float32)
        out = S.conv1x1_strided(st, dmap, jnp.asarray(w))
        m = np.asarray(out.mask)
        oc = np.asarray(out.coords)
        got = np.asarray(out.feats)
        lut = {tuple(c): f for c, f in zip(coords, feats)}
        for j in np.where(m)[0]:
            src = lut.get(tuple(2 * oc[j]), np.zeros(3, np.float32))
            np.testing.assert_allclose(got[j], src @ w[0], atol=1e-5)


class TestCustomVJPs:
    """The gather-only conv backwards must match XLA autodiff exactly."""

    def test_subm_gather_conv_vjp(self):
        rng = np.random.RandomState(7)
        raw = rng.randint(-10, 10, (900, 3)).astype(np.int32)
        u = H.unique_coords(jnp.asarray(raw), jnp.ones(900, bool), 768)
        mask = u.mask
        feats = jnp.asarray(rng.randn(768, 16).astype(np.float32))
        nbr = S.neighbor_table(S.SparseTensor(u.coords, None, mask),
                               S.OFFSETS_3)
        w = jnp.asarray((rng.randn(27, 16, 8) * 0.1).astype(np.float32))
        ct = jnp.asarray(rng.randn(768, 8).astype(np.float32))

        def f_ref(f, ww):
            return jnp.sum(S.gather_matmul_conv(f, mask, nbr, ww) * ct)

        def f_new(f, ww):
            return jnp.sum(S.subm_gather_conv(f, mask, nbr, ww) * ct)

        gr = jax.grad(f_ref, argnums=(0, 1))(feats, w)
        gn = jax.grad(f_new, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gn[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gn[1]),
                                   atol=1e-4)

    def test_strided_gather_conv_vjp(self):
        from embodiedscan_tpu.models.sparse_nn import stage_tables
        rng = np.random.RandomState(8)
        raw = rng.randint(-12, 12, (1200, 3)).astype(np.int32)
        u = H.unique_coords(jnp.asarray(raw), jnp.ones(1200, bool), 1024)
        st = S.SparseTensor(u.coords[None], jnp.asarray(
            rng.randn(1, 1024, 12).astype(np.float32)), u.mask[None])
        dmap = S.bmap(lambda c, m: S.downsample_coords(
            S.SparseTensor(c, None, m), 512), (0, 0))(st.coords, st.mask)
        s_nbr, nbr, t_nbr = stage_tables(st, dmap, with_transpose=True)
        w = jnp.asarray((rng.randn(27, 12, 6) * 0.1).astype(np.float32))
        ct = jnp.asarray(rng.randn(1, 512, 6).astype(np.float32))
        omask = dmap.mask

        def f_ref(f, ww):
            out = jax.vmap(S.gather_matmul_conv, in_axes=(0, 0, 0, None))(
                f, st.mask, s_nbr, ww)
            return jnp.sum(jnp.where(omask[..., None], out, 0) * ct)

        def f_new(f, ww):
            out = jax.vmap(S.strided_gather_conv,
                           in_axes=(0, 0, 0, 0, None))(f, st.mask, s_nbr,
                                                       t_nbr, ww)
            return jnp.sum(jnp.where(omask[..., None], out, 0) * ct)

        assert abs(float(f_ref(st.feats, w) - f_new(st.feats, w))) < 1e-4
        gr = jax.grad(f_ref, argnums=(0, 1))(st.feats, w)
        gn = jax.grad(f_new, argnums=(0, 1))(st.feats, w)
        np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gn[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gn[1]),
                                   atol=1e-4)


class TestBatchedTopkTies:
    """Pin topk_select_b vs per-sample topk_select at b=8 (VERDICT r3 #8).

    The flat batched path truncates ceil(log2(B)) low score-key bits to
    pack the batch id into one int32 sort key (ops/sparse.py:194-230). With
    B=8 that drops 3 mantissa bits: scores separated by more than 2^-20
    relative select identically; adversarial near-ties inside the truncated
    granularity may tie-break differently but must still be a valid top-k
    at truncated precision.
    """

    B, N, K, C = 8, 64, 16, 4

    def _batch(self, scores):
        rng = np.random.RandomState(7)
        coords, feats, mask = [], [], []
        for i in range(self.B):
            c = rng.randint(-20, 20, size=(self.N * 2, 3)).astype(np.int32)
            c = np.unique(c, axis=0)[:self.N]
            assert c.shape[0] == self.N
            coords.append(c)
            feats.append(rng.randn(self.N, self.C).astype(np.float32))
            m = np.ones(self.N, bool)
            m[-4:] = False  # some invalid rows per sample
            mask.append(m)
        st = S.SparseTensor(jnp.asarray(np.stack(coords)),
                            jnp.asarray(np.stack(feats)),
                            jnp.asarray(np.stack(mask)))
        return st, jnp.asarray(scores)

    def _rowsets(self, st_b, out_b):
        """Selected (coord tuple) sets per sample, valid rows only."""
        sets = []
        for i in range(self.B):
            m = np.asarray(out_b.mask[i])
            sets.append({tuple(r) for r in np.asarray(out_b.coords[i])[m]})
        return sets

    def _per_sample(self, st, scores):
        outs = []
        for i in range(self.B):
            sti = S.SparseTensor(st.coords[i], st.feats[i], st.mask[i])
            outs.append(S.topk_select(sti, scores[i], self.K))
        return outs

    def test_separated_scores_select_identically(self):
        rng = np.random.RandomState(1)
        # scores distinct at much coarser than 2^-20 relative granularity
        scores = rng.uniform(0.1, 10.0, (self.B, self.N)).astype(np.float32)
        st, scores = self._batch(scores)
        flat = S.topk_select_b(st, scores, self.K)
        per = self._per_sample(st, scores)
        for i in range(self.B):
            m_f = np.asarray(flat.mask[i])
            m_p = np.asarray(per[i].mask)
            got = {tuple(r) for r in np.asarray(flat.coords[i])[m_f]}
            want = {tuple(r) for r in np.asarray(per[i].coords)[m_p]}
            assert got == want, f'sample {i}'
            # engine invariant: both key-sorted -> identical row order too
            np.testing.assert_array_equal(
                np.asarray(flat.coords[i])[m_f],
                np.asarray(per[i].coords)[m_p])
            np.testing.assert_allclose(np.asarray(flat.feats[i])[m_f],
                                       np.asarray(per[i].feats)[m_p],
                                       rtol=0, atol=0)

    def test_near_ties_valid_at_truncated_precision(self):
        # adversarial: all scores inside one truncated-key bucket around
        # the k boundary — low 3 mantissa bits only
        base = np.float32(1.0)
        eps = np.spacing(base, dtype=np.float32)  # 1 ulp at 1.0
        rng = np.random.RandomState(2)
        jitter = rng.randint(0, 8, (self.B, self.N)).astype(np.float32)
        scores = base + jitter * eps  # spans exactly the truncated bits
        st, scores = self._batch(scores.astype(np.float32))
        flat = S.topk_select_b(st, scores, self.K)
        per = self._per_sample(st, scores)

        def trunc_key(s):
            return np.asarray(
                jax.vmap(S._monotone_desc_key)(s)).astype(np.uint32) >> 3

        tk = trunc_key(scores)
        for i in range(self.B):
            m = np.asarray(st.mask[i])
            m_f = np.asarray(flat.mask[i])
            sel_rows = []
            sel_coords = np.asarray(flat.coords[i])[m_f]
            all_coords = np.asarray(st.coords[i])
            for r in sel_coords:
                hits = np.where((all_coords == r).all(-1) & m)[0]
                assert hits.size == 1
                sel_rows.append(hits[0])
            sel_rows = np.asarray(sorted(sel_rows))
            assert len(sel_rows) == self.K
            # valid top-k at truncated precision: every selected row's
            # truncated key must be <= (descending key: better) every
            # unselected valid row's, allowing equality
            unsel = np.setdiff1d(np.where(m)[0], sel_rows)
            assert tk[i][sel_rows].max() <= tk[i][unsel].min()
            # and the truncated-key multiset must match the per-sample
            # selection's (both are top-k of the same truncated multiset)
            m_p = np.asarray(per[i].mask)
            per_coords = np.asarray(per[i].coords)[m_p]
            per_rows = []
            for r in per_coords:
                hits = np.where((all_coords == r).all(-1) & m)[0]
                per_rows.append(hits[0])
            np.testing.assert_array_equal(
                np.sort(tk[i][sel_rows]), np.sort(tk[i][np.asarray(per_rows)]))
