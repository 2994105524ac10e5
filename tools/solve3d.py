"""TPU solve of the checkpointed 1M 3-D unstructured hierarchy
(tools/setup3d.py): per-level format table, V-cycle wall time, and the
full PCG solve — BASELINE configs[2] evidence.

Usage: python tools/solve3d.py [--side 101] [--ckpt /tmp/h3d_1M.npz]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=101)
    ap.add_argument("--ckpt", type=str, default="/tmp/h3d_1M.npz")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--elasticity", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_amg.utils.platform import apply_env_platform

    apply_env_platform()
    on_tpu = jax.devices()[0].platform == "tpu"
    reps = args.reps if on_tpu else 2

    from tpu_amg.solver import AMGSolver, SolverConfig
    from tpu_amg.solvers import cg
    from tpu_amg.utils.problems import (
        unstructured_elasticity_3d,
        unstructured_poisson_3d,
    )

    t0 = time.perf_counter()
    a = (unstructured_elasticity_3d(args.side) if args.elasticity
         else unstructured_poisson_3d(args.side))
    print(f"# system n={a.nrows} nnz={a.nnz} rebuilt "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    cfg = SolverConfig(
        dtype=jnp.float32, dense_threshold=8192, setup_on_host=True,
        smoothing_steps=1,
    )
    solver = AMGSolver.load(args.ckpt, a, cfg)
    t_load = time.perf_counter() - t0
    print(f"# load+mg build {t_load:.0f}s", file=sys.stderr, flush=True)
    mg = solver.preconditioner
    for i, lvl in enumerate(getattr(mg, "levels", ())):
        a_l = lvl.a
        fmt = type(getattr(a_l, "ell", a_l)).__name__
        well = getattr(a_l, "well", None)
        print(f"# level {i}: n={a_l.shape[0]} fmt={fmt}"
              + (f" mv={type(well).__name__}" if well is not None else ""),
              file=sys.stderr, flush=True)

    x = jnp.ones(a.nrows, dtype=jnp.float32)

    # pass mg as a jit ARG: closure-captured operators become giant
    # HLO constants (2.6 GB at 1M) and the remote-compile tunnel
    # rejects the program body (HTTP 413)
    @jax.jit
    def cycle_n(m_, v):
        def body(u, _):
            return m_.mv(u), None
        u, _ = jax.lax.scan(body, v, None, length=reps)
        return u

    _sync(cycle_n(mg, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(cycle_n(mg, x))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"# vcycle[f32]={best*1e3:.2f}ms", file=sys.stderr, flush=True)

    x_true = jnp.asarray(
        np.random.default_rng(3).normal(size=a.nrows), jnp.float32
    )
    b = solver.op.mv(x_true)

    @jax.jit
    def solve(op_, m_, b_):
        x_, info = cg(op_, b_, m_, rtol=1e-6, maxiter=300)
        return x_, info.iters, info.final_res

    xs, it, res = solve(solver.op, mg, b)
    _sync(xs)
    t0 = time.perf_counter()
    xs, it, res = solve(solver.op, mg, b)
    _sync(xs)
    dt_solve = time.perf_counter() - t0
    print(f"# solve: {dt_solve*1e3:.0f}ms {int(it)} iters res "
          f"{float(res):.2e}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": ("unstructured3d_elasticity_solve_" if args.elasticity
                   else "unstructured3d_poisson_solve_") + str(a.nrows),
        "value": round(dt_solve * 1e3, 1),
        "unit": "ms",
        "vcycle_ms": round(best * 1e3, 3),
        "iters": int(it),
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
