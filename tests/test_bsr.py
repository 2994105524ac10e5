"""BSR block-sparse format."""

import numpy as np
import pytest

from tpu_amg.sparse import CSR
from tpu_amg.sparse.bsr import BSR
from tpu_amg.utils.problems import elasticity_3d, poisson2d


class TestBSR:
    def test_spmv_matches_oracle_elasticity(self):
        a = elasticity_3d(3)  # block_size 3
        bsr = BSR.from_csr(a)
        x = np.random.default_rng(0).normal(size=a.ncols)
        np.testing.assert_allclose(
            np.asarray(bsr.mv(x)), a.matvec(x), rtol=1e-10, atol=1e-12
        )

    def test_spmm_matches(self):
        a = elasticity_3d(3)
        bsr = BSR.from_csr(a)
        xs = np.random.default_rng(1).normal(size=(a.ncols, 5))
        np.testing.assert_allclose(
            np.asarray(bsr.mm(xs)), a.to_dense() @ xs, rtol=1e-10, atol=1e-12
        )

    def test_scalar_matrix_blocked(self):
        # bs=2 blocking of a scalar 2-D Poisson
        a = poisson2d(8)  # 64 dofs
        bsr = BSR.from_csr(a, block_size=2)
        x = np.random.default_rng(2).normal(size=64)
        np.testing.assert_allclose(
            np.asarray(bsr.mv(x)), a.matvec(x), rtol=1e-10, atol=1e-12
        )

    def test_diagonal_and_sums(self):
        a = elasticity_3d(3)
        bsr = BSR.from_csr(a)
        np.testing.assert_allclose(
            np.asarray(bsr.diagonal()), a.diagonal(), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(bsr.row_sums()), a.row_sums(), atol=1e-10
        )
        # abs_row_sums counts explicit zeros inside stored blocks as 0 --
        # matches since |0| = 0
        np.testing.assert_allclose(
            np.asarray(bsr.abs_row_sums()), a.abs_row_sums(), atol=1e-10
        )

    def test_indivisible_raises(self):
        a = poisson2d(5)  # 25 dofs
        with pytest.raises(ValueError):
            BSR.from_csr(a, block_size=2)

    def test_dispatch_uses_bsr_for_blocks(self):
        from tpu_amg.linop import SparseOperator

        a = elasticity_3d(3)
        op = SparseOperator.from_csr(a)
        assert type(op.ell).__name__ == "BSR"
