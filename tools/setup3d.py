"""Build + checkpoint the BASELINE configs[2] system: ~1M-dof 3-D
unstructured Poisson SA hierarchy (utils/problems.py
unstructured_poisson_3d).  Setup is host-side; the checkpoint lets the
TPU solve run (tools/solve3d.py / bench_unstructured --dim 3) skip the
multi-minute rebuild.

Usage: python tools/setup3d.py [--side 101] [--out /tmp/h3d.npz]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=101)
    ap.add_argument("--out", type=str, default="/tmp/h3d.npz")
    ap.add_argument("--elasticity", action="store_true",
                    help="block-3 truss elasticity on the tet mesh "
                         "instead of scalar Poisson")
    ap.add_argument("--trunc", type=float, default=None,
                    help="P truncation tol (default 0.1 scalar / "
                         "0.05 elasticity; 0 disables)")
    ap.add_argument("--drop", type=float, default=0.01,
                    help="non-Galerkin coarse sparsification tol "
                         "(0 disables)")
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from tpu_amg.utils.platform import apply_env_platform

    apply_env_platform()
    import jax.numpy as jnp

    from tpu_amg.solver import AMGSolver, SolverConfig
    from tpu_amg.utils.problems import (
        unstructured_elasticity_3d,
        unstructured_poisson_3d,
    )

    t0 = time.perf_counter()
    a = (unstructured_elasticity_3d(args.side) if args.elasticity
         else unstructured_poisson_3d(args.side))
    t_sys = time.perf_counter() - t0
    print(f"# system n={a.nrows} nnz={a.nnz} block={a.block_size} "
          f"built {t_sys:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    trunc = args.trunc if args.trunc is not None else (
        0.05 if args.elasticity else 0.1
    )
    trunc = trunc or None
    drop = args.drop or None
    if args.elasticity:
        cfg = SolverConfig(
            coarsening_near_null_dim=12,
            interp_near_null_dim=6,  # rigid modes span 6
            coarsening_factor=16.0,
            smoothing_steps=1,
            smoothing_iters=8,
            coarsest_dim=1500,
            dtype=jnp.float32,
            dense_threshold=8192,
            setup_on_host=True,
            sa_trunc_tol=trunc,
            coarse_drop_tol=drop,
        )
    else:
        cfg = SolverConfig(
            coarsening_near_null_dim=8,
            interp_near_null_dim=2,
            # 3-D scalar: keep cf*cd >= ~25 (SolverConfig note) so the
            # smoothed-P Galerkin operators stay sparse
            coarsening_factor=16.0,
            smoothing_steps=1,
            smoothing_iters=10,
            coarsest_dim=1500,
            dtype=jnp.float32,
            dense_threshold=8192,
            setup_on_host=True,
            sa_trunc_tol=trunc,
            coarse_drop_tol=drop,
        )
    solver = AMGSolver.setup(a, cfg)
    t_setup = time.perf_counter() - t0
    print(f"# setup {t_setup:.0f}s op_cplx "
          f"{solver.hierarchy.op_complexity():.2f} "
          f"grid_cplx {solver.hierarchy.grid_complexity():.2f}",
          file=sys.stderr, flush=True)
    print(repr(solver.hierarchy), file=sys.stderr, flush=True)
    solver.save(args.out)
    print(f"# hierarchy checkpoint -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
