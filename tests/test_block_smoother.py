"""Block smoother: diagonal compensation + batched block solves
(reference block_smoothers.rs)."""

import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import aslinearoperator
from tpu_amg.partition import Partition
from tpu_amg.preconditioners import BlockSmoother
from tpu_amg.solvers import cg
from tpu_amg.utils.problems import elasticity_3d, poisson1d, poisson2d
from tpu_amg.utils.testing import symmetry_test


def interval_partition(n, size):
    return Partition(np.arange(n) // size)


class TestBlockSmoother:
    def test_matches_dense_blocks_no_cut(self):
        # single aggregate covering everything: apply == full inverse
        a = poisson1d(9)
        p = Partition(np.zeros(8, dtype=int))
        bs = BlockSmoother.build(a, p)
        rhs = jnp.asarray(np.random.default_rng(0).normal(size=8))
        x = np.asarray(bs.mv(rhs))
        np.testing.assert_allclose(a.matvec(x), np.asarray(rhs), atol=1e-10)

    def test_scalar_diag_compensation(self):
        # two aggregates of the 1-D chain: cut edge between nodes 3,4 adds
        # 0.5*sqrt(d_i/d_j)*|a_ij| to both sides' diagonals
        a = poisson1d(9)  # d=2/h^2, offdiag -1/h^2
        p = interval_partition(8, 4)
        bs = BlockSmoother.build(a, p)
        h2 = (1.0 / 9) ** 2
        blk = np.asarray(bs.buckets[0].inv_blocks[0])
        expected = a.extract(range(4), range(4))
        expected[3, 3] += 0.5 * 1.0 / h2  # sqrt(d/d)=1, |a_ij| = 1/h^2
        np.testing.assert_allclose(
            np.linalg.inv(blk)[:4, :4], expected, rtol=1e-10, atol=1e-8
        )

    def test_symmetric(self):
        a = poisson2d(8)
        p = interval_partition(64, 8)
        bs = BlockSmoother.build(a, p)
        assert symmetry_test(bs)

    def test_preconditions_cg(self):
        csr = poisson2d(24)
        op = aslinearoperator(csr)
        p = interval_partition(csr.nrows, 24)
        bs = BlockSmoother.build(csr, p)
        b = jnp.ones(csr.nrows)
        _, plain = cg(op, b, rtol=1e-8)
        _, smoothed = cg(op, b, bs, rtol=1e-8)
        assert bool(smoothed.converged)
        assert int(smoothed.iters) < int(plain.iters)

    def test_multivector_matches_single(self):
        a = poisson2d(6)
        p = interval_partition(36, 6)
        bs = BlockSmoother.build(a, p)
        xs = jnp.asarray(np.random.default_rng(1).normal(size=(36, 4)))
        batched = np.asarray(bs.mm(xs))
        singles = np.column_stack(
            [np.asarray(bs.mv(xs[:, i])) for i in range(4)]
        )
        np.testing.assert_allclose(batched, singles, rtol=1e-12)

    def test_vector_block_compensation(self):
        # elasticity with block_size 3: build must use SVD-based block
        # compensation and still yield an SPD smoother
        a = elasticity_3d(3)
        part = Partition(np.arange(a.nrows // 3) // 9).expand_blocks(3)
        bs = BlockSmoother.build(a, part)
        assert symmetry_test(bs, rtol=1e-8)
        # positive definite on random vectors
        rng = np.random.default_rng(2)
        for _ in range(3):
            v = jnp.asarray(rng.normal(size=a.nrows))
            assert float(jnp.vdot(v, bs.mv(v))) > 0
