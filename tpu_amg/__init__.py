"""tpu-amg: a TPU-native adaptive algebraic multigrid framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the Rust
``faer-amg`` reference (adaptive smoothed-aggregation + classical AMG
preconditioning for sparse SPD systems), designed TPU-first:

- sparse containers are immutable pytrees (CSR for host setup, padded ELL /
  blocked-ELL for the TPU compute path),
- the hot SpMV/SpMM path runs as fused XLA gathers or Pallas kernels,
- smoothers are batched dense solves (MXU-friendly),
- hierarchy setup (strength graph, modularity aggregation, tentative +
  smoothed P, Galerkin RAP) runs as host-side graph algorithms + batched
  XLA linear algebra,
- multi-chip scaling uses `jax.sharding` meshes with row-partitioned levels.

Double precision is enabled at import: the reference library is f64
throughout (faer ``SparseRowMat<usize, f64>``, reference core.rs:13-17) and
AMG setup/solve tolerances (1e-12) require it.  TPU hot paths explicitly
request f32/bf16 where appropriate.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (compiles dominate setup wall-time on
# small hosts; set TPU_AMG_NO_COMPILE_CACHE=1 to disable).
if not os.environ.get("TPU_AMG_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TPU_AMG_CACHE_DIR", "/tmp/tpu_amg_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from tpu_amg import errors, sparse  # noqa: E402


def __getattr__(name):
    # lazy top-level conveniences (avoid import cycles at package init)
    if name in ("AMGSolver", "SolverConfig"):
        from tpu_amg import solver

        return getattr(solver, name)
    if name == "Hierarchy":
        from tpu_amg.hierarchy import Hierarchy

        return Hierarchy
    if name == "HierarchyConfig":
        from tpu_amg.hierarchy import HierarchyConfig

        return HierarchyConfig
    if name == "AdaptiveConfig":
        from tpu_amg.adaptivity import AdaptiveConfig

        return AdaptiveConfig
    if name in ("cast_operator", "cast_preconditioner", "MixedPrecision"):
        from tpu_amg import precision

        return getattr(precision, name)
    raise AttributeError(f"module 'tpu_amg' has no attribute {name!r}")


from tpu_amg.linop import (  # noqa: E402
    LinearOperator,
    SparseOperator,
    DenseOperator,
    ComposedOperator,
    ScaledIdentity,
    aslinearoperator,
)

__version__ = "0.1.0"

__all__ = [
    "errors",
    "sparse",
    "AMGSolver",
    "SolverConfig",
    "Hierarchy",
    "HierarchyConfig",
    "AdaptiveConfig",
    "LinearOperator",
    "SparseOperator",
    "DenseOperator",
    "ComposedOperator",
    "ScaledIdentity",
    "aslinearoperator",
    "cast_operator",
    "cast_preconditioner",
    "MixedPrecision",
]
