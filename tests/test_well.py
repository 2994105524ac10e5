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
        # strays are allowed (they ride the on-chip patch kernel) but
        # must stay a small fraction
        assert w.nnz > 0 and w.n_extras < 0.1 * w.nnz

    def test_wide_band_multi_group(self):
        # window spans several 8-row groups → exercises stage A masking
        # (sparse-group layouts compress the span to USED groups)
        w = _check(_random_banded(2000, 400, 4, 9, seed=1))
        assert w.n_groups >= 2 or w.win_rows > 8

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
        # the contiguous-window (dense) layout must reject full-range
        # scatter; the sparse-group layout HANDLES this matrix (59 used
        # 8-row groups over a 469-row x2d) and must produce correct y
        rng = np.random.default_rng(5)
        n, nnz = 60000, 300000
        i = rng.integers(0, n, nnz)
        j = rng.integers(0, n, nnz)  # columns scattered over the full range
        m = sps.coo_matrix((np.ones(nnz), (i, j)), shape=(n, n)).tocsr()
        m.sum_duplicates()
        with pytest.raises(WellUnsupported):
            WELL.from_csr(CSR.from_scipy(m), sparse_groups=False)
        w = WELL.from_csr(CSR.from_scipy(m))
        assert w.sparse_groups
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(w.mv(np.asarray(x)))
        ref = m @ x
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=2e-5 * np.abs(ref).max()
        )


class TestWellModes:
    """x-mode equivalence + packed-word consistency — pins the v2
    single-word (lam/pid/rho/amap) and rts (route/merge) construction
    that the kernel consumes in two index domains."""

    @pytest.mark.parametrize("x_mode", ["resident", "blocked"])
    def test_x_mode_equivalence(self, x_mode):
        from tpu_amg.ops.well_pallas import well_spmv

        for sp, seed in ((_random_banded(2000, 400, 4, 9, seed=1), 1),
                         (_random_banded(600, 60, 2, 30, seed=2), 2)):
            sp = sp.tocsr()
            sp.sort_indices()
            w = WELL.from_csr(CSR.from_scipy(sp))
            x = np.random.default_rng(seed).standard_normal(
                sp.shape[1]).astype(np.float32)
            y = np.asarray(well_spmv(w, np.asarray(x), x_mode=x_mode))
            ref = sp @ x
            np.testing.assert_allclose(
                y, ref, rtol=0, atol=2e-5 * np.abs(ref).max()
            )

    def test_block4_packing(self):
        # block=4 lanes pack sparse rows ~tighter (the hybrid-remainder
        # mode, sparse/hybrid.py); same numerics
        sp = _random_banded(20000, 400, 2, 6, seed=3).tocsr()
        sp.sort_indices()
        w8 = WELL.from_csr(CSR.from_scipy(sp), block=8)
        w4 = WELL.from_csr(CSR.from_scipy(sp), block=4)
        # block=4 never packs worse; at this small n tile padding can
        # equalize the two (the 1M hybrid remainder measures ~30%
        # fewer slots, MEASURED.md)
        assert w4.data.size <= w8.data.size
        x = np.random.default_rng(0).standard_normal(20000).astype(
            np.float32)
        ref = sp @ x
        for w in (w4, w8):
            y = np.asarray(w.mv(np.asarray(x)))
            np.testing.assert_allclose(
                y, ref, rtol=0, atol=2e-5 * np.abs(ref).max())

    def test_packed_word_gather_chain(self):
        # reconstruct each nonzero slot's window row through
        # (pid, rho, lam, amap) on the HOST and assert the gathered
        # column matches the original matrix entry
        sp = _random_banded(2000, 400, 4, 9, seed=1).tocsr()
        sp.sort_indices()
        well = WELL.from_csr(CSR.from_scipy(sp))
        nv = np.asarray(well.qv).shape[0]
        data = np.asarray(well.data).reshape(nv, 8, 128)
        w = np.asarray(well.w).reshape(nv, 8, 128).astype(np.int64)
        qv = np.asarray(well.qv).astype(np.int64)
        lam = w & 127
        pid = (w >> 7) & 3
        amap = (w >> 21) & 1023
        rho = np.stack(
            [(w >> (9 + 3 * p)) & 7 for p in range(well.n_passes)],
            axis=1,
        )
        s_idx = np.arange(8)[None, :, None]
        v_idx = np.arange(nv)[:, None, None]
        # the kernel's gather chain for slot (m, l) is
        #   table[rho[pass, m, lam[m,l]], lam[m,l]]
        # i.e. rho is consulted at the TABLE lane, not the slot lane
        trow = rho[v_idx, np.minimum(pid, well.n_passes - 1), s_idx, lam]
        wrow = amap[v_idx, trow, lam]
        if well.sparse_groups:
            # sparse window groups: amap = (used-group ordinal << 3) |
            # row-in-group; the per-vreg gmap list maps ordinals to
            # absolute x2d groups
            ngs = np.asarray(well.gmap).shape[2] // well.vregs_per_tile
            gm = np.asarray(well.gmap).astype(np.int64).reshape(-1, ngs)
            abs_row = gm[v_idx, wrow >> 3] * 8 + (wrow & 7)
            col = abs_row * 128 + lam
        else:
            col = (qv[:, None, None] + wrow) * 128 + lam
        if well.n_ex_groups:
            # pass id 3 = in-kernel extras: sigma (word bits 18-20 at
            # the table position) indexes the per-TILE extras table
            f = well.vregs_per_tile
            tile_of = np.arange(nv) // f
            extw = np.asarray(well.ex_tw).astype(np.int64)
            exq = np.asarray(well.ex_q).astype(np.int64)
            sig = (w >> 18) & 7
            sig_at = sig[v_idx, s_idx, lam]
            t3 = tile_of[:, None, None] + 0 * lam
            eta_x = extw[t3, sig_at, lam] & 7
            grp_x = (extw[t3, sig_at, lam] >> 3) & 31
            col_ex = (
                exq[tile_of][:, None, None] + grp_x * 8 + eta_x
            ) * 128 + lam
            col = np.where(pid == 3, col_ex, col)
        # gather x through the reconstructed columns and compare the
        # slot-wise products against a dense SpMV
        rng = np.random.default_rng(0)
        x = rng.standard_normal(sp.shape[1])
        xp = np.zeros(well.x2d_rows * 128)
        xp[: sp.shape[1]] = x
        contrib = data * xp[col]
        # per-row sums via the rts route/merge metadata equal A @ x
        g = well.rows_per_vrow
        bpv = well.out_cols
        block = well.block
        # heterogeneous reduce columns: piecewise col-of-lane (same
        # formula as the kernel selector)
        from tpu_amg.sparse.well import _unit_split_capped

        ll = np.arange(128)
        if well.idroute:
            sel_g = g
            p4, p2, _ = _unit_split_capped(128 - block * g, block, g)
        else:
            sel_g, p4, p2 = bpv, 0, 0
        half = max(block // 2, 1)
        quart = max(block // 4, 1)
        full_end = (sel_g + p4) * block
        half_end = full_end + p2 * half
        colmap = np.where(
            ll < sel_g * block,
            ll // block,
            np.where(
                ll < full_end,
                sel_g + (ll - sel_g * block) // block,
                np.where(
                    ll < half_end,
                    sel_g + p4 + (ll - full_end) // half,
                    sel_g + p4 + p2 + (ll - half_end) // quart,
                ),
            ),
        )
        bs = np.zeros((nv, 8, bpv))
        np.add.at(
            bs.transpose(2, 0, 1), colmap, contrib.transpose(2, 0, 1)
        )
        rts = np.asarray(well.rts).reshape(nv, 8, bpv).astype(np.int64)
        cm = bs.copy()
        if well.idroute:
            # identity-route: fold the flagged overflow blocks (6 rts
            # bits per round) into the row's own lane; no route gather
            for k in range(well.merge_rounds):
                fld = rts >> (7 * k)
                ov = np.take_along_axis(cm, fld & 63, axis=2)
                cm = cm + np.where((fld >> 6) & 1, ov, 0.0)
            y = cm
        else:
            for k in range(well.merge_rounds):
                sft = 1 << k
                shifted = np.concatenate(
                    [cm[:, :, sft:], cm[:, :, -1:].repeat(sft, axis=2)],
                    axis=2)
                mask = (rts >> (5 + k)) & 1
                cm = cm + np.where(mask != 0, shifted, 0.0)
            y = np.take_along_axis(cm, rts & 31, axis=2)
        y = y.reshape(-1, bpv)[:, :g].reshape(-1)[: sp.shape[0]]
        if np.asarray(well.extra_cols).size:
            np.add.at(
                y,
                np.asarray(well.extra_rows)[
                    np.asarray(well.extra_seg)
                ],
                np.asarray(well.extra_vals)
                * x[np.asarray(well.extra_cols)],
            )
        ref = sp @ x
        # data is stored f32; the reconstruction is exact modulo that cast
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=1e-6 * np.abs(ref).max())


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


class TestStrayPatch:
    def test_clustered_heavy_rows_force_strays(self):
        """A run of consecutive heavy rows overloads one group's tail
        units so some entries become strays — they must flow through
        the grid-1 patch kernel (idroute), not silently drop."""
        n = 4000
        rng = np.random.default_rng(7)
        a = _random_banded(n, 60, 3, 5, seed=7).tolil()
        # 30 consecutive rows with ~18 nnz each: their shared group's
        # units cannot cover everyone
        for i in range(600, 630):
            cols = np.unique(rng.integers(i - 50, i + 50, 18).clip(0, n - 1))
            a[i, cols] = rng.standard_normal(len(cols))
        sp = a.tocsr()
        sp.sort_indices()
        w = WELL.from_csr(CSR.from_scipy(sp), block=4, idroute=True)
        assert w.idroute
        assert w.n_extras > 0  # strays exist → patch kernel in play
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(w.mv(np.asarray(x)))
        ref = sp @ x
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=2e-5 * np.abs(ref).max()
        )


class TestCompactOutput:
    def test_compact_matches_legacy(self):
        """Opt-in compact output layout (in-kernel row-major compaction):
        same y as the legacy padded-block layout + XLA extract."""
        sp = _random_banded(3000, 40, 3, 7, seed=11).tocsr()
        sp.sort_indices()
        w = WELL.from_csr(CSR.from_scipy(sp), block=4, compact=True)
        if not w.compact:
            pytest.skip("no aligned rows_per_vrow for this matrix")
        assert w.idroute
        rng = np.random.default_rng(3)
        x = rng.standard_normal(3000).astype(np.float32)
        y = np.asarray(w.mv(np.asarray(x)))
        ref = sp @ x
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=2e-5 * np.abs(ref).max()
        )

    def test_rectangular_well(self):
        """WELL on a rectangular banded operator (grid-transfer shape):
        nothing in the layout requires squareness — callers gate on it
        only for the halo path."""
        rng = np.random.default_rng(5)
        n, nc = 4000, 640
        rows, cols, vals = [], [], []
        for i in range(n):
            deg = rng.integers(2, 6)
            nbr = np.unique(
                np.clip(i * nc // n + rng.integers(-12, 13, deg), 0, nc - 1)
            )
            rows += [i] * len(nbr)
            cols += list(nbr)
            vals += list(rng.standard_normal(len(nbr)))
        sp = sps.coo_matrix((vals, (rows, cols)), shape=(n, nc)).tocsr()
        sp.sort_indices()
        w = WELL.from_csr(CSR.from_scipy(sp), block=4)
        x = rng.standard_normal(nc).astype(np.float32)
        y = np.asarray(w.mv(np.asarray(x)))
        ref = sp @ x
        np.testing.assert_allclose(
            y, ref, rtol=0, atol=2e-5 * max(np.abs(ref).max(), 1)
        )
