"""CG + stationary iteration + smoothers (SURVEY.md §7 stage 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import DiagonalOperator, SparseOperator, aslinearoperator
from tpu_amg.preconditioners import (
    ErrorPropagator,
    KStepSmoother,
    build_smoother,
    jacobi_inverse_diag,
    l1_inverse_diag,
    l2_inverse_diag,
)
from tpu_amg.preconditioners.coarse import DenseCholeskySolver, DensePinvSolver
from tpu_amg.solvers import cg, stationary_iteration
from tpu_amg.utils.problems import poisson1d, poisson2d


class TestCG:
    def test_unpreconditioned_exact(self):
        a = aslinearoperator(poisson1d(17))
        b = jnp.asarray(np.random.default_rng(0).normal(size=16))
        x, info = cg(a, b, rtol=1e-12)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(a.mv(x)), b, atol=1e-9)

    def test_jacobi_preconditioned_faster(self):
        csr = poisson2d(12)
        a = aslinearoperator(csr)
        b = jnp.asarray(np.random.default_rng(1).normal(size=csr.nrows))
        _, plain = cg(a, b, rtol=1e-10)
        m = build_smoother("l1", a.ell)
        _, pre = cg(a, b, m, rtol=1e-10)
        assert bool(pre.converged)
        # l1 preconditioner should not be (much) worse
        assert int(pre.iters) <= int(plain.iters) + 5

    def test_flexible_matches_standard_for_fixed_precond(self):
        # with an exactly-fixed SPD M, the Polak-Ribière beta reduces to
        # the Fletcher-Reeves one in exact arithmetic — same iterates
        csr = poisson2d(12)
        a = aslinearoperator(csr)
        b = jnp.asarray(np.random.default_rng(3).normal(size=csr.nrows))
        m = build_smoother("l1", a.ell)
        x_std, std = cg(a, b, m, rtol=1e-10)
        x_flex, flex = cg(a, b, m, rtol=1e-10, flexible=True)
        assert bool(flex.converged)
        assert abs(int(flex.iters) - int(std.iters)) <= 1
        np.testing.assert_allclose(
            np.asarray(x_flex), np.asarray(x_std), atol=1e-8
        )

    def test_flexible_robust_to_varying_preconditioner(self):
        # bf16-rounded cycle = slightly inexact M; FCG must still converge
        from tpu_amg.precision import cast_preconditioner
        from tpu_amg.solver import AMGSolver, SolverConfig

        csr = poisson2d(24)
        solver = AMGSolver.setup(
            csr,
            SolverConfig(
                coarsening_near_null_dim=8, smoothing_iters=5,
                coarsest_dim=64, dtype=jnp.float32,
            ),
        )
        m16 = cast_preconditioner(solver.preconditioner, "bf16")
        b = jnp.asarray(
            np.random.default_rng(4).normal(size=csr.nrows), jnp.float32
        )
        x, info = cg(solver.op, b, m16, rtol=1e-6, flexible=True)
        assert bool(info.converged)

    def test_history_monotone_start(self):
        a = aslinearoperator(poisson1d(33))
        b = jnp.ones(32)
        _, info = cg(a, b, rtol=1e-10)
        h = info.history()
        assert h[-1] <= 1e-10 * np.linalg.norm(np.asarray(b)) + 1e-30
        assert len(h) == int(info.iters) + 1

    def test_jit_compatible(self):
        csr = poisson1d(9)
        a = aslinearoperator(csr)

        @jax.jit
        def solve(a, b):
            x, info = cg(a, b, rtol=1e-10, maxiter=50)
            return x, info.iters

        b = jnp.ones(8)
        x, iters = solve(a, b)
        np.testing.assert_allclose(
            np.asarray(a.mv(x)), np.asarray(b), atol=1e-8
        )
        assert int(iters) <= 8  # CG converges in <= n iters


class TestStationary:
    def test_converges_with_jacobi(self):
        csr = poisson1d(9)
        a = aslinearoperator(csr)
        m = build_smoother("jacobi", a.ell, omega=0.66)
        b = jnp.ones(8)
        x, info = stationary_iteration(a, b, m, rtol=1e-8, maxiter=2000)
        assert bool(info.converged)
        np.testing.assert_allclose(
            np.asarray(a.mv(x)), np.asarray(b), atol=1e-6
        )


class TestSmootherFormulas:
    def test_l1_formula(self):
        csr = poisson2d(4)
        ell = aslinearoperator(csr).ell
        np.testing.assert_allclose(
            np.asarray(l1_inverse_diag(ell)), 1.0 / csr.abs_row_sums()
        )

    def test_l2_formula(self):
        csr = poisson2d(4)
        ell = aslinearoperator(csr).ell
        # hand-computed: d_i = sum_j |a_ij| sqrt(a_ii)/sqrt(a_jj)
        d = np.zeros(csr.nrows)
        diag = csr.diagonal()
        rows, cols, vals = csr.coo()
        for r, c, v in zip(rows, cols, vals):
            d[r] += abs(v) * np.sqrt(diag[r]) / np.sqrt(diag[c])
        np.testing.assert_allclose(np.asarray(l2_inverse_diag(ell)), 1.0 / d)

    def test_jacobi_formula(self):
        csr = poisson2d(4)
        ell = aslinearoperator(csr).ell
        np.testing.assert_allclose(
            np.asarray(jacobi_inverse_diag(ell, 0.66)), 0.66 / csr.diagonal()
        )

    def test_kstep_smoother_symmetric(self):
        from tpu_amg.utils.testing import symmetry_test

        csr = poisson1d(17)
        a = aslinearoperator(csr)
        m = build_smoother("l1", a.ell)
        s = KStepSmoother(a=a, m=m, iters=3)
        assert symmetry_test(s)

    def test_error_propagator_reduces_error(self):
        csr = poisson1d(33)
        a = aslinearoperator(csr)
        m = build_smoother("l1", a.ell)
        e = ErrorPropagator(a=a, m=m, iters=5)
        x = jnp.asarray(np.random.default_rng(0).normal(size=32))
        ex = e.mv(x)
        a_norm = lambda v: float(jnp.vdot(v, a.mv(v)))
        assert a_norm(ex) < a_norm(x)

    def test_error_propagator_transpose(self):
        csr = poisson1d(9)
        a = aslinearoperator(csr)
        m = DiagonalOperator(diag=jacobi_inverse_diag(a.ell, 0.7))
        e = ErrorPropagator(a=a, m=m, iters=2)
        n = 8
        fwd = np.column_stack(
            [np.asarray(e.mv(jnp.eye(n)[:, i])) for i in range(n)]
        )
        bwd = np.column_stack(
            [np.asarray(e.rmv(jnp.eye(n)[:, i])) for i in range(n)]
        )
        np.testing.assert_allclose(fwd.T, bwd, atol=1e-12)


class TestCoarseSolvers:
    def test_cholesky_exact(self):
        csr = poisson1d(9)
        s = DenseCholeskySolver.build(csr)
        b = jnp.ones(8)
        x = s.mv(b)
        np.testing.assert_allclose(
            csr.matvec(np.asarray(x)), np.asarray(b), atol=1e-10
        )

    def test_pinv_handles_singular(self):
        # singular: Laplacian with nullspace = constants (Neumann-like)
        n = 6
        dense = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
        dense[0, 0] = dense[-1, -1] = 1.0  # pure Neumann ends -> singular
        from tpu_amg.sparse import CSR

        csr = CSR.from_dense(dense)
        s = DensePinvSolver.build(csr)
        b = jnp.asarray(np.random.default_rng(0).normal(size=n))
        b = b - jnp.mean(b)  # project out nullspace
        x = s.mv(b)
        np.testing.assert_allclose(dense @ np.asarray(x), np.asarray(b), atol=1e-9)
