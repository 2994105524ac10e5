"""Chebyshev polynomial smoother."""

import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import aslinearoperator
from tpu_amg.preconditioners.chebyshev import (
    ChebyshevSmoother,
    estimate_lambda_max,
)
from tpu_amg.preconditioners.smoothers import l1_inverse_diag
from tpu_amg.solvers import cg
from tpu_amg.utils.problems import poisson1d, poisson2d
from tpu_amg.utils.testing import symmetry_test


class TestChebyshev:
    def test_lambda_max_estimate(self):
        a = poisson1d(33)
        op = aslinearoperator(a)
        d_inv = l1_inverse_diag(op.ell)
        lam = float(estimate_lambda_max(op, d_inv))
        # exact λ_max of D⁻¹A for l1-scaled 1-D Poisson is < 2; estimate
        # should land within [true, 1.2*true]
        dense = np.diag(np.asarray(d_inv)) @ a.to_dense()
        true = np.linalg.eigvals(dense).real.max()
        assert true * 0.99 <= lam <= true * 1.25

    def test_symmetric(self):
        a = poisson2d(8)
        op = aslinearoperator(a)
        cheb = ChebyshevSmoother.build(op, l1_inverse_diag(op.ell), degree=3)
        assert symmetry_test(cheb, rtol=1e-8)

    def test_worst_case_band_damping_beats_jacobi(self):
        # chebyshev minimizes the worst-case damping over the target band
        # [λ_max/30, λ_max]; 3 damped-jacobi sweeps barely touch the low
        # band edge. Compare per-eigenvector damping factors.
        a = poisson2d(12)
        op = aslinearoperator(a)
        d_inv = l1_inverse_diag(op.ell)
        cheb = ChebyshevSmoother.build(op, d_inv, degree=3)
        from tpu_amg.linop import DiagonalOperator
        from tpu_amg.preconditioners.smoothers import KStepSmoother

        jac = KStepSmoother(
            a=op, m=DiagonalOperator(diag=0.66 * d_inv), iters=3
        )
        dense = np.asarray(d_inv)[:, None] * a.to_dense()
        w, v = np.linalg.eig(dense)
        w, v = w.real, v.real
        in_band = (w >= float(cheb.lam_min)) & (w <= float(cheb.lam_max))

        def worst_damping(smoother):
            worst = 0.0
            for i in np.flatnonzero(in_band):
                vec = jnp.asarray(v[:, i])
                ev = vec - smoother.mv(op.mv(vec))
                worst = max(
                    worst,
                    float(jnp.linalg.norm(ev) / jnp.linalg.norm(vec)),
                )
            return worst

        assert worst_damping(cheb) < worst_damping(jac)
        assert worst_damping(cheb) < 0.75

    def test_in_multigrid(self):
        from tests.test_hierarchy import near_null_basis, sa_config
        from tpu_amg.hierarchy import HierarchyConfig
        from tpu_amg.preconditioners.multigrid_builder import MultigridConfig

        a = poisson2d(16)
        nn = near_null_basis(a, k=2)
        h = HierarchyConfig(
            coarsest_dim=40, interpolation_config=sa_config()
        ).build(a, nn)
        mg = MultigridConfig(smoother="chebyshev", chebyshev_degree=3).build(h)
        op = aslinearoperator(a)
        b = jnp.ones(a.nrows)
        _, info = cg(op, b, mg, rtol=1e-10)
        assert bool(info.converged)
        assert int(info.iters) <= 20

    def test_multivector(self):
        a = poisson2d(6)
        op = aslinearoperator(a)
        cheb = ChebyshevSmoother.build(op, l1_inverse_diag(op.ell))
        xs = jnp.asarray(np.random.default_rng(1).normal(size=(36, 3)))
        batched = np.asarray(cheb.mm(xs))
        singles = np.column_stack(
            [np.asarray(cheb.mv(xs[:, i])) for i in range(3)]
        )
        np.testing.assert_allclose(batched, singles, rtol=1e-12)
