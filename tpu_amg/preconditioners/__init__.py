"""Preconditioners: diagonal/block smoothers, coarse solvers, multigrid,
multiplicative composites (reference src/preconditioners/*)."""

from tpu_amg.preconditioners.smoothers import (
    l1_inverse_diag,
    l2_inverse_diag,
    jacobi_inverse_diag,
    build_smoother,
    KStepSmoother,
    ErrorPropagator,
)
from tpu_amg.preconditioners.coarse import DenseCholeskySolver, DensePinvSolver
from tpu_amg.preconditioners.multigrid import Multigrid, Level
from tpu_amg.preconditioners.composite import Composite
from tpu_amg.preconditioners.block_smoother import BlockSmoother

__all__ = [
    "l1_inverse_diag",
    "l2_inverse_diag",
    "jacobi_inverse_diag",
    "build_smoother",
    "KStepSmoother",
    "ErrorPropagator",
    "DenseCholeskySolver",
    "DensePinvSolver",
    "Multigrid",
    "Level",
    "Composite",
    "BlockSmoother",
]
