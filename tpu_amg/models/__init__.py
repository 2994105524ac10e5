"""Model-problem families with tuned solver presets.

Each family bundles (a) the discretized operator, (b) a right-hand side,
and (c) a :class:`tpu_amg.solver.SolverConfig` tuned for that problem
class — the productized equivalent of the reference's per-example CLI
flag sets (examples/amg/main.rs:123-140 coefficient datasets,
simple_geometric.rs, elasticity use cases in core.rs:22-36).
"""

from tpu_amg.models.families import (
    ModelProblem,
    poisson,
    anisotropic_diffusion,
    elasticity,
    from_mfem,
)

__all__ = [
    "ModelProblem",
    "poisson",
    "anisotropic_diffusion",
    "elasticity",
    "from_mfem",
]
