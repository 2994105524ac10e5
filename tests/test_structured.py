"""Structured-grid gather-free transfers and multigrid."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_amg.linop import aslinearoperator
from tpu_amg.solvers import cg
from tpu_amg.structured import (
    SmoothedTransferP,
    StructuredInterp,
    build_structured_multigrid,
    structured_partition,
)
from tpu_amg.utils.problems import poisson2d, poisson3d


class TestStructuredPartition:
    def test_even_grid(self):
        part, cs = structured_partition((4, 4))
        assert cs == (2, 2)
        assert part.num_aggs == 4
        assert (part.agg_sizes() == 4).all()

    def test_odd_grid(self):
        part, cs = structured_partition((5, 3))
        assert cs == (3, 2)
        part.validate()
        assert part.num_aggs == 6


class TestStructuredInterp:
    @pytest.mark.parametrize("shape", [(8, 8), (7, 5), (6, 6, 6), (5, 4, 3)])
    def test_matches_materialized(self, shape):
        part, cs = structured_partition(shape)
        sizes = part.agg_sizes()
        w = 1.0 / np.sqrt(sizes[part.node_to_agg].astype(np.float64))
        interp = StructuredInterp(
            weights=jnp.asarray(w), fine_shape=shape, coarse_shape=cs
        )
        p_dense = interp.to_csr().to_dense()
        rng = np.random.default_rng(0)
        xc = rng.normal(size=interp.shape[1])
        xf = rng.normal(size=interp.shape[0])
        np.testing.assert_allclose(
            np.asarray(interp.mv(jnp.asarray(xc))), p_dense @ xc, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(interp.rmv(jnp.asarray(xf))), p_dense.T @ xf, atol=1e-12
        )

    def test_orthonormal_columns(self):
        part, cs = structured_partition((8, 8))
        sizes = part.agg_sizes()
        w = 1.0 / np.sqrt(sizes[part.node_to_agg].astype(np.float64))
        interp = StructuredInterp(
            weights=jnp.asarray(w), fine_shape=(8, 8), coarse_shape=cs
        )
        p = interp.to_csr().to_dense()
        np.testing.assert_allclose(p.T @ p, np.eye(16), atol=1e-12)


class TestSmoothedTransfer:
    def test_matches_materialized_smoothed_p(self):
        from tpu_amg.interpolation.sa import smooth_interpolation

        shape = (8, 8)
        a = poisson2d(*shape)
        part, cs = structured_partition(shape)
        sizes = part.agg_sizes()
        w = 1.0 / np.sqrt(sizes[part.node_to_agg].astype(np.float64))
        tent = StructuredInterp(
            weights=jnp.asarray(w), fine_shape=shape, coarse_shape=cs
        )
        a_op = aslinearoperator(a)
        d_inv = jnp.asarray(0.66 / a.diagonal())
        lazy = SmoothedTransferP(tentative=tent, a=a_op, d_inv=d_inv)
        p_mat = smooth_interpolation(a, tent.to_csr(), 0.66).to_dense()
        rng = np.random.default_rng(1)
        xc = rng.normal(size=16)
        xf = rng.normal(size=64)
        np.testing.assert_allclose(
            np.asarray(lazy.mv(jnp.asarray(xc))), p_mat @ xc, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(lazy.rmv(jnp.asarray(xf))), p_mat.T @ xf, atol=1e-10
        )


class TestStructuredMultigrid:
    def test_poisson2d_convergence(self):
        a = poisson2d(32)
        mg = build_structured_multigrid(
            a, (32, 32), coarsest_dim=64, dtype=jnp.float64
        )
        op = aslinearoperator(a)
        b = jnp.ones(a.nrows)
        _, info = cg(op, b, mg, rtol=1e-8)
        assert bool(info.converged)
        assert int(info.iters) <= 12

    def test_poisson3d_convergence(self):
        a = poisson3d(12)
        mg = build_structured_multigrid(
            a, (12, 12, 12), coarsest_dim=64, dtype=jnp.float64
        )
        op = aslinearoperator(a)
        b = jnp.ones(a.nrows)
        _, info = cg(op, b, mg, rtol=1e-8)
        assert bool(info.converged)
        assert int(info.iters) <= 15

    def test_unsmoothed_also_converges(self):
        a = poisson2d(32)
        mg = build_structured_multigrid(
            a, (32, 32), coarsest_dim=64, smoothing=False, dtype=jnp.float64
        )
        op = aslinearoperator(a)
        b = jnp.ones(a.nrows)
        _, info = cg(op, b, mg, rtol=1e-8)
        assert bool(info.converged)
        assert int(info.iters) <= 30
