"""Sparse core: CSR construction, ELL conversion, SpMV/SpMM vs oracle,
SpGEMM/RAP (SURVEY.md §7 stage 1)."""

import numpy as np
import pytest

from tpu_amg.sparse import CSR, ELL, rap, sp_add, spgemm
from tpu_amg.utils.problems import poisson1d, poisson2d, poisson3d


def random_csr(n, m, density, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    nnz = max(int(n * m * density), 1)
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    vals = rng.normal(size=nnz)
    a = CSR.from_coo(rows, cols, vals, (n, m))
    if spd:
        dense = a.to_dense()
        dense = dense @ dense.T + n * np.eye(n)
        a = CSR.from_dense(dense)
    return a


class TestCSR:
    def test_from_coo_duplicate_summing(self):
        # duplicates must sum (faer try_new_from_triplets semantics)
        a = CSR.from_coo([0, 0, 1], [1, 1, 0], [2.0, 3.0, 1.0], (2, 2))
        assert a.nnz == 2
        np.testing.assert_allclose(a.to_dense(), [[0, 5], [1, 0]])

    def test_round_trip_dense(self):
        rng = np.random.default_rng(1)
        dense = rng.normal(size=(7, 5)) * (rng.random((7, 5)) > 0.5)
        a = CSR.from_dense(dense)
        np.testing.assert_allclose(a.to_dense(), dense)

    def test_transpose(self):
        a = random_csr(13, 7, 0.3)
        np.testing.assert_allclose(a.transpose().to_dense(), a.to_dense().T)

    def test_matvec_oracle(self):
        a = random_csr(11, 11, 0.3, seed=2)
        x = np.random.default_rng(3).normal(size=11)
        np.testing.assert_allclose(a.matvec(x), a.to_dense() @ x)

    def test_diagonal_rowsums(self):
        a = poisson2d(4)
        np.testing.assert_allclose(a.diagonal(), np.full(16, 4.0))
        d = a.to_dense()
        np.testing.assert_allclose(a.row_sums(), d.sum(axis=1))
        np.testing.assert_allclose(a.abs_row_sums(), np.abs(d).sum(axis=1))

    def test_extract(self):
        a = random_csr(10, 10, 0.4, seed=5)
        ri = [1, 3, 7]
        ci = [0, 3, 9]
        np.testing.assert_allclose(
            a.extract(ri, ci), a.to_dense()[np.ix_(ri, ci)]
        )

    def test_block_size_validation(self):
        with pytest.raises(ValueError):
            CSR.from_coo([0], [0], [1.0], (3, 3), block_size=2)


class TestELL:
    @pytest.mark.parametrize("gen", [poisson1d, poisson2d, poisson3d])
    def test_spmv_matches_oracle(self, gen):
        a = gen(5)
        ell = ELL.from_csr(a)
        x = np.random.default_rng(0).normal(size=a.ncols)
        np.testing.assert_allclose(
            np.asarray(ell.mv(x)), a.matvec(x), rtol=1e-12
        )

    def test_spmm_matches_oracle(self):
        a = poisson2d(6)
        ell = ELL.from_csr(a)
        xs = np.random.default_rng(1).normal(size=(a.ncols, 9))
        np.testing.assert_allclose(
            np.asarray(ell.mm(xs)), a.to_dense() @ xs, rtol=1e-12
        )

    def test_rectangular(self):
        a = random_csr(12, 5, 0.4, seed=7)
        ell = ELL.from_csr(a)
        x = np.random.default_rng(2).normal(size=5)
        np.testing.assert_allclose(np.asarray(ell.mv(x)), a.to_dense() @ x)

    def test_diagonal(self):
        a = poisson3d(3)
        ell = ELL.from_csr(a)
        np.testing.assert_allclose(np.asarray(ell.diagonal()), a.diagonal())

    def test_abs_row_sums(self):
        a = poisson2d(4)
        ell = ELL.from_csr(a)
        np.testing.assert_allclose(
            np.asarray(ell.abs_row_sums()), a.abs_row_sums()
        )

    def test_empty_rows(self):
        a = CSR.from_coo([0], [1], [3.0], (4, 4))
        ell = ELL.from_csr(a)
        x = np.arange(4.0)
        np.testing.assert_allclose(np.asarray(ell.mv(x)), [3.0, 0, 0, 0])


class TestSpGEMM:
    def test_spgemm_oracle(self):
        a = random_csr(9, 6, 0.4, seed=1)
        b = random_csr(6, 8, 0.4, seed=2)
        c = spgemm(a, b)
        np.testing.assert_allclose(c.to_dense(), a.to_dense() @ b.to_dense())

    def test_sp_add(self):
        a = random_csr(5, 5, 0.5, seed=3)
        b = random_csr(5, 5, 0.5, seed=4)
        c = sp_add(a, b, 2.0, -1.0)
        np.testing.assert_allclose(
            c.to_dense(), 2 * a.to_dense() - b.to_dense()
        )

    def test_rap_symmetric(self):
        a = poisson2d(5)
        p = random_csr(25, 6, 0.3, seed=8)
        ac = rap(a, p)
        dense = p.to_dense().T @ a.to_dense() @ p.to_dense()
        np.testing.assert_allclose(ac.to_dense(), dense, atol=1e-12)
        np.testing.assert_allclose(ac.to_dense(), ac.to_dense().T, atol=1e-12)
