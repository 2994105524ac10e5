"""Geometric multigrid mesh-independence oracle (SURVEY.md §4.1).

Rebuilds the reference's ``simple_geometric`` refinement study
(examples/simple_geometric.rs:176-301): 1-D Poisson with linear
interpolation / full-weighting transfer and Jacobi(0.66) smoothing must
converge in a ~constant number of PCG iterations as the grid refines,
while Jacobi-preconditioned PCG degrades.
"""

import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import SparseOperator, aslinearoperator
from tpu_amg.preconditioners import Multigrid, Level, build_smoother
from tpu_amg.preconditioners.coarse import DenseCholeskySolver
from tpu_amg.solvers import cg
from tpu_amg.utils.problems import (
    geometric_interpolation_1d,
    geometric_restriction_1d,
    poisson1d,
)
from tpu_amg.utils.testing import symmetry_test


from tpu_amg.utils.geometric import build_geometric_mg  # noqa: E402,F401


class TestGeometricMG:
    def test_two_grid_beats_jacobi(self):
        fine, mg = build_geometric_mg(refinements=3)
        a = aslinearoperator(fine)
        b = jnp.ones(fine.nrows)
        _, info_mg = cg(a, b, mg, rtol=1e-8)
        m_jac = build_smoother("jacobi", a.ell, omega=0.66)
        _, info_jac = cg(a, b, m_jac, rtol=1e-8)
        assert bool(info_mg.converged)
        assert int(info_mg.iters) < int(info_jac.iters)

    def test_mesh_independence(self):
        """PCG+MG iterations stay ~constant as dofs grow 16x."""
        iters = []
        for refinements in (2, 4, 6):
            fine, mg = build_geometric_mg(refinements)
            a = aslinearoperator(fine)
            b = jnp.ones(fine.nrows)
            _, info = cg(a, b, mg, rtol=1e-8)
            assert bool(info.converged)
            iters.append(int(info.iters))
        # mesh independence: no growth beyond a small constant
        assert iters[-1] <= iters[0] + 3
        assert iters[-1] <= 15

    def test_vcycle_symmetric(self):
        _, mg = build_geometric_mg(refinements=3)
        assert symmetry_test(mg, rtol=1e-9)

    def test_wcycle_converges(self):
        fine, mg = build_geometric_mg(refinements=3)
        import dataclasses

        w = dataclasses.replace(mg, mu=2)
        a = aslinearoperator(fine)
        b = jnp.ones(fine.nrows)
        _, info = cg(a, b, w, rtol=1e-8)
        assert bool(info.converged)
        assert int(info.iters) <= 12

    def test_multivector_cycle_matches_single(self):
        fine, mg = build_geometric_mg(refinements=2)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.normal(size=(fine.nrows, 3)))
        batched = np.asarray(mg.mm(xs))
        singles = np.column_stack(
            [np.asarray(mg.mv(xs[:, i])) for i in range(3)]
        )
        np.testing.assert_allclose(batched, singles, rtol=1e-12)
