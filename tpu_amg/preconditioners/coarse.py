"""Coarsest-level direct solvers.

The reference offers sparse/dense Cholesky (``CoarseSolverKind::Cholesky``)
with SVD/Eigh declared but unimplemented (reference coarse_solvers.rs:27-40).
On TPU the coarsest grid (default ≤ 1000 dofs, hierarchy.rs:30-32) is far
below MXU saturation as a sparse problem, so we densify it and use a dense
Cholesky factor applied as two triangular solves — a single fused XLA op.
We also actually implement the pseudo-inverse (eigh) variant the reference
stubs out, for semi-definite coarse grids.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import LinearOperator
from tpu_amg.sparse.csr import CSR


def _densify(a) -> jnp.ndarray:
    if isinstance(a, CSR):
        return jnp.asarray(a.to_dense())
    if hasattr(a, "ell"):
        a = a.ell
    if hasattr(a, "offsets"):  # DIA
        n = a.shape[0]
        dense = np.zeros(a.shape)
        data = np.asarray(a.data)
        for d, off in enumerate(a.offsets):
            rows = np.arange(max(0, -off), min(n, n - off))
            dense[rows, rows + off] = data[d, rows]
        return jnp.asarray(dense)
    if hasattr(a, "cols"):  # ELL
        dense = np.zeros(a.shape)
        cols = np.asarray(a.cols)
        data = np.asarray(a.data)
        np.add.at(dense, (np.arange(a.shape[0])[:, None], cols), data)
        return jnp.asarray(dense)
    return jnp.asarray(a)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseCholeskySolver(LinearOperator):
    """Exact solve via a Cholesky-factored inverse, applied as a dense
    matmul.

    Role of the reference's Sparse/DenseCholeskySolve
    (coarse_solvers.rs:55-276).  TPU note: triangular solves execute
    (near-)sequentially on TPU and dominate the whole V-cycle (measured
    ~100 ms for a 1.5k coarse grid); A⁻¹ is therefore materialized once
    at build through the Cholesky factorization, making every
    application a single MXU matmul (~µs).  Symmetric: rmv = mv.
    """

    inv: jax.Array  # A⁻¹ = L⁻ᵀ L⁻¹, materialized at build

    @property
    def shape(self):
        return self.inv.shape

    @staticmethod
    def build(a) -> "DenseCholeskySolver":
        # factor/invert on the HOST: this is one-time setup work, and
        # dense factorization ops hit fragile TPU compiler paths on some
        # runtimes; only the final inverse ships to the device.
        dense = np.asarray(_densify(a))
        chol = np.linalg.cholesky(dense)
        inv_l = np.linalg.inv(chol)
        return DenseCholeskySolver(inv=jnp.asarray(inv_l.T @ inv_l))

    def mv(self, x):
        return self.inv @ x

    def mm(self, xs):
        return self.inv @ xs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensePinvSolver(LinearOperator):
    """Pseudo-inverse solve via eigendecomposition (the reference's
    unimplemented ``CoarseSolverKind::Eigh``, coarse_solvers.rs:27-40).

    Robust for singular/semi-definite coarse operators (e.g. pure-Neumann
    problems where the constant is in the kernel).
    """

    pinv: jax.Array  # materialized dense pseudo-inverse

    @property
    def shape(self):
        return self.pinv.shape

    @staticmethod
    def build(a, rtol: float = 1e-12) -> "DensePinvSolver":
        dense = np.asarray(_densify(a))  # host-side (see DenseCholeskySolver)
        w, v = np.linalg.eigh(dense)
        cutoff = rtol * np.max(np.abs(w))
        inv_w = np.where(np.abs(w) > cutoff, 1.0 / w, 0.0)
        return DensePinvSolver(pinv=jnp.asarray((v * inv_w) @ v.T))

    def mv(self, x):
        return self.pinv @ x

    def mm(self, xs):
        return self.pinv @ xs


def build_coarse_solver(kind: str, a, dtype=None) -> LinearOperator:
    """Reference ``CoarseSolverKind`` dispatch (coarse_solvers.rs:14-42)."""
    n = a.shape[0]
    if n > 20_000:
        # n^2 f64 densification at this size is multi-GB and LAPACK potrf
        # has been observed to segfault near the int32 element boundary —
        # fail with guidance instead of crashing the process
        from tpu_amg.errors import MultigridBuildError

        raise MultigridBuildError(
            f"coarsest level has {n} dofs — too large for a dense direct "
            "solve. Lower max_levels restrictions or raise coarsest_dim "
            "so the hierarchy coarsens further."
        )
    if kind == "cholesky":
        s = DenseCholeskySolver.build(a)
        if dtype is not None:
            s = DenseCholeskySolver(inv=s.inv.astype(dtype))
        return s
    if kind in ("eigh", "pinv", "svd"):
        s = DensePinvSolver.build(a)
        if dtype is not None:
            s = DensePinvSolver(pinv=s.pinv.astype(dtype))
        return s
    raise ValueError(f"unknown coarse solver kind {kind!r}")
