"""DIA diagonal-format SpMV fast path."""

import numpy as np
import pytest

from tpu_amg.sparse import CSR, DIA
from tpu_amg.sparse.dia import try_from_csr
from tpu_amg.utils.problems import poisson1d, poisson2d, poisson3d


class TestDIA:
    @pytest.mark.parametrize("gen", [poisson1d, poisson2d, poisson3d])
    def test_spmv_matches_oracle(self, gen):
        a = gen(5)
        dia = try_from_csr(a)
        assert dia is not None
        x = np.random.default_rng(0).normal(size=a.ncols)
        np.testing.assert_allclose(
            np.asarray(dia.mv(x)), a.matvec(x), rtol=1e-12
        )

    def test_spmm_matches(self):
        a = poisson2d(6)
        dia = try_from_csr(a)
        xs = np.random.default_rng(1).normal(size=(36, 5))
        np.testing.assert_allclose(
            np.asarray(dia.mm(xs)), a.to_dense() @ xs, rtol=1e-12
        )

    def test_diagonal_and_row_sums(self):
        a = poisson3d(3)
        dia = try_from_csr(a)
        np.testing.assert_allclose(np.asarray(dia.diagonal()), a.diagonal())
        np.testing.assert_allclose(
            np.asarray(dia.abs_row_sums()), a.abs_row_sums()
        )
        np.testing.assert_allclose(np.asarray(dia.row_sums()), a.row_sums())

    def test_too_many_diagonals_returns_none(self):
        rng = np.random.default_rng(2)
        n = 64
        rows = rng.integers(0, n, 400)
        cols = rng.integers(0, n, 400)
        a = CSR.from_coo(rows, cols, np.ones(400), (n, n))
        assert try_from_csr(a, max_diags=8) is None

    def test_wraparound_annihilated(self):
        # offsets ±1 on a small chain: rolled entries must not leak
        a = poisson1d(5)  # tridiag 4x4
        dia = try_from_csr(a)
        x = np.array([1.0, 10.0, 100.0, 1000.0])
        np.testing.assert_allclose(np.asarray(dia.mv(x)), a.matvec(x))


class TestDiaSmoothers:
    def test_l2_formula_matches_ell(self):
        from tpu_amg.preconditioners.smoothers import l2_inverse_diag
        from tpu_amg.sparse import ELL

        a = poisson2d(5)
        ell = ELL.from_csr(a)
        dia = try_from_csr(a)
        np.testing.assert_allclose(
            np.asarray(l2_inverse_diag(dia)),
            np.asarray(l2_inverse_diag(ell)),
            rtol=1e-12,
        )

    def test_l1_jacobi_on_dia(self):
        from tpu_amg.preconditioners.smoothers import (
            jacobi_inverse_diag,
            l1_inverse_diag,
        )

        a = poisson3d(4)
        dia = try_from_csr(a)
        np.testing.assert_allclose(
            np.asarray(l1_inverse_diag(dia)), 1.0 / a.abs_row_sums()
        )
        np.testing.assert_allclose(
            np.asarray(jacobi_inverse_diag(dia, 0.5)), 0.5 / a.diagonal()
        )
