"""WELL (windowed-ELL) format + Pallas kernel tests (interpret mode on
CPU; the same kernel is hardware-validated on TPU v5e, see MEASURED.md).

Covers the role of the reference's ParSpmm blocked-CSR kernel for
arbitrary banded matrices (reference par_spmm.rs:98-132).
"""

import numpy as np
import pytest
import scipy.sparse as sps

from tpu_amg.sparse.csr import CSR
from tpu_amg.sparse.well import WELL, WellUnsupported


def _check(sp, seed=0, **kw):
    sp = sp.tocsr()
    sp.sort_indices()
    w = WELL.from_csr(CSR.from_scipy(sp), **kw)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(sp.shape[1]).astype(np.float32)
    y = np.asarray(w.mv(np.asarray(x)))
    ref = sp @ x
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(y, ref, rtol=0, atol=2e-5 * scale)
    return w


def _random_banded(n, band, lo_deg, hi_deg, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        deg = rng.integers(lo_deg, hi_deg + 1)
        nbr = np.unique(np.clip(i + rng.integers(-band, band + 1, deg), 0, n - 1))
        rows += [i] * len(nbr)
        cols += list(nbr)
    vals = rng.standard_normal(len(rows))
    return sps.coo_matrix((vals, (rows, cols)), shape=(n, n))


class TestWellCorrectness:
    def test_random_banded(self):
        w = _check(_random_banded(700, 50, 3, 11))
        assert w.nnz > 0 and w.n_extras < 0.01 * w.nnz

    def test_wide_band_multi_group(self):
        # window spans several 8-row groups → exercises stage A masking
        w = _check(_random_banded(2000, 400, 4, 9, seed=1))
        assert w.win_rows > 8

    def test_heavy_rows_merge(self):
        # rows up to 30 nnz → multi-block rows and >1 merge round
        w = _check(_random_banded(600, 60, 2, 30, seed=2))
        assert w.merge_rounds >= 2

    def test_structured_poisson(self):
        from tpu_amg.utils.problems import poisson2d

        _check(poisson2d(40).to_scipy())

    def test_rectangular(self):
        rng = np.random.default_rng(3)
        m = sps.random(500, 300, density=0.02, random_state=3).tocoo()
        keep = np.abs(m.col * (500 / 300) - m.row) < 50
        m2 = sps.coo_matrix(
            (m.data[keep], (m.row[keep], m.col[keep])), shape=m.shape
        )
        _check(m2)

    def test_duplicate_columns_via_extras(self):
        # a dense-ish row that blows the block budget spills to extras,
        # still summing correctly
        n = 300
        a = _random_banded(n, 20, 3, 6, seed=4).tolil()
        a[7, :140] = 1.0  # 140-nnz row: spills beyond its block budget
        w = _check(a, max_spill_frac=0.5)
        assert w.n_extras > 0

    def test_unbanded_rejected(self):
        rng = np.random.default_rng(5)
        n, nnz = 60000, 300000
        i = rng.integers(0, n, nnz)
        j = rng.integers(0, n, nnz)  # columns scattered over the full range
        m = sps.coo_matrix((np.ones(nnz), (i, j)), shape=(n, n)).tocsr()
        m.sum_duplicates()
        with pytest.raises(WellUnsupported):
            WELL.from_csr(CSR.from_scipy(m))


class TestWellModes:
    """All kernel variants must agree — pins the gb (glo/ghi/p_hi)
    dynamic-bounds construction that only mode 2 consumes."""

    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_mode_equivalence(self, mode):
        from tpu_amg.ops.well_pallas import well_spmv

        for sp, seed in ((_random_banded(2000, 400, 4, 9, seed=1), 1),
                         (_random_banded(600, 60, 2, 30, seed=2), 2)):
            sp = sp.tocsr()
            sp.sort_indices()
            w = WELL.from_csr(CSR.from_scipy(sp))
            x = np.random.default_rng(seed).standard_normal(
                sp.shape[1]).astype(np.float32)
            y = np.asarray(well_spmv(w, np.asarray(x), mode=mode))
            ref = sp @ x
            np.testing.assert_allclose(
                y, ref, rtol=0, atol=2e-5 * np.abs(ref).max()
            )

    def test_gb_bounds_cover_touched_groups(self):
        # reconstruct each nonzero slot's window row through
        # (pid, rho, lam, amap) and assert it falls inside gb's group
        # range, and its pass id under gb's pass bound
        sp = _random_banded(2000, 400, 4, 9, seed=1).tocsr()
        sp.sort_indices()
        w = WELL.from_csr(CSR.from_scipy(sp))
        nv = np.asarray(w.gb).reshape(-1, 3).shape[0]
        gb = np.asarray(w.gb).reshape(nv, 3)
        data = np.asarray(w.data).reshape(nv, 8, 128)
        # unpack the w1 (slot-domain) and w2 (table-domain) words
        w1 = np.asarray(w.w1).reshape(nv, 8, 128).astype(np.int64)
        w2 = np.asarray(w.w2).reshape(nv, 8, 128).astype(np.int64)
        lam = w1 & 127
        pid = (w1 >> 7) & 7
        amap = (w2 >> 12) & 127
        P = w.n_passes
        rho = np.stack(
            [(w2 >> (3 * p)) & 7 for p in range(P)], axis=1
        )
        s_idx = np.arange(8)[None, :, None]
        v_idx = np.arange(nv)[:, None, None]
        # the kernel's gather chain for slot (m, l) is
        #   table[rho[pass, m, lam[m,l]], lam[m,l]]
        # i.e. rho is consulted at the TABLE lane, not the slot lane
        trow = rho[v_idx, pid, s_idx, lam]
        wrow = amap[v_idx, trow, lam]
        grp = wrow >> 3
        touched = data != 0
        for v in range(nv):
            if not touched[v].any():
                continue
            g = grp[v][touched[v]]
            assert g.min() >= gb[v, 0] and g.max() <= gb[v, 1]
            assert pid[v][touched[v]].max() < gb[v, 2]


class TestWellOperator:
    def test_sparse_operator_uses_well(self):
        import jax.numpy as jnp

        from tpu_amg.linop import SparseOperator

        sp = _random_banded(6000, 80, 4, 9, seed=6).tocsr()
        sp.sort_indices()
        op = SparseOperator.from_csr(
            CSR.from_scipy(sp), dtype=jnp.float32,
            prefer_dia=False, prefer_well=True,
        )
        assert op.well is not None
        x = np.random.default_rng(0).standard_normal(6000).astype(np.float32)
        y = np.asarray(op.mv(jnp.asarray(x)))
        ref = sp @ x
        np.testing.assert_allclose(
            y, ref, atol=2e-5 * np.abs(ref).max(), rtol=0
        )
        # multi-vector path routes through per-column WELL SpMVs when
        # the stored format is a plain ELL (linop.py SparseOperator.mm)
        xs = np.random.default_rng(1).standard_normal((6000, 3)).astype(
            np.float32)
        ys = np.asarray(op.mm(jnp.asarray(xs)))
        assert ys.shape == (6000, 3)
        np.testing.assert_allclose(
            ys, sp @ xs, atol=2e-5 * np.abs(sp @ xs).max(), rtol=0
        )
