"""Problem generators, I/O, stats/reporting, solver test drivers."""

from tpu_amg.utils.problems import (
    poisson1d,
    poisson2d,
    poisson3d,
    anisotropic_diffusion_2d,
    elasticity_3d,
    geometric_interpolation_1d,
    geometric_restriction_1d,
)
from tpu_amg.utils.stats import matrix_stats, format_stats_table
from tpu_amg.utils.testing import (
    test_solver,
    approx_convergence_factor,
    symmetry_test,
)

__all__ = [
    "poisson1d",
    "poisson2d",
    "poisson3d",
    "anisotropic_diffusion_2d",
    "elasticity_3d",
    "geometric_interpolation_1d",
    "geometric_restriction_1d",
    "matrix_stats",
    "format_stats_table",
    "test_solver",
    "approx_convergence_factor",
    "symmetry_test",
]
