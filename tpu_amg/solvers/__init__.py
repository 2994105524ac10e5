"""Krylov and relaxation solvers.

The reference consumes these from faer (``conjugate_gradient``,
``stationary_iteration``; reference utils.rs:14-19, 580-627) — here we own
them as jit-compiled JAX loops.
"""

from tpu_amg.solvers.cg import cg, SolveInfo
from tpu_amg.solvers.stationary import stationary_iteration

__all__ = ["cg", "stationary_iteration", "SolveInfo"]
