"""Per-level, per-component V-cycle attribution for the checkpointed 1M
3-D hierarchy (tools/setup3d.py): times each level's A·x, smoother
apply, and P/R transfer as chained executables on the device, so the
100 ms V-cycle of record (MEASURED.md round-4 3-D section) is
attributed to its actual hot ops instead of guessed at.

Usage: python tools/vcycle_breakdown.py [--side 101] [--ckpt /tmp/h3d_1M.npz]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.ravel(x)[0]))


def jnp_zero():
    import jax.numpy as jnp

    return jnp.zeros((), jnp.float32)


def timed(fn, x, reps, trials=3):
    import jax

    @jax.jit
    def chain(v):
        def body(carry, _):
            u, acc = carry
            u2 = fn(u)
            if u2.shape != u.shape:
                # shape-changing op (P/R): keep the input fixed and keep
                # the output alive via the scalar accumulator so XLA
                # cannot dead-code-eliminate the op
                return (u, acc + u2.ravel()[0]), None
            return (u2, acc), None

        (u, acc), _ = jax.lax.scan(
            body, (v, jnp_zero()), None, length=reps
        )
        return u.ravel()[0] + acc

    _sync(chain(x))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(chain(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


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
    reps = args.reps if jax.devices()[0].platform == "tpu" else 2

    from tpu_amg.solver import AMGSolver, SolverConfig
    from tpu_amg.utils.problems import (
        unstructured_elasticity_3d,
        unstructured_poisson_3d,
    )

    a = (unstructured_elasticity_3d(args.side) if args.elasticity
         else unstructured_poisson_3d(args.side))
    cfg = SolverConfig(
        dtype=jnp.float32, dense_threshold=8192, setup_on_host=True,
        smoothing_steps=1,
    )
    solver = AMGSolver.load(args.ckpt, a, cfg)
    mg = solver.preconditioner
    total = 0.0
    rows = []
    for i, lvl in enumerate(getattr(mg, "levels", ())):
        n = lvl.a.shape[0]
        x = jnp.ones(n, dtype=jnp.float32)
        t_a = timed(lvl.a.mv, x, reps)
        t_s = timed(lvl.smoother.mv, x, reps)
        t_p = t_r = 0.0
        if lvl.p is not None:
            nc = lvl.p.shape[1]
            xc = jnp.ones(nc, dtype=jnp.float32)
            t_p = timed(lvl.p.mv, xc, reps)
            t_r = timed(lvl.r.mv, x, reps)
        rows.append((i, n, t_a, t_s, t_p, t_r))
        # per V-cycle: 2 smoother applies (pre+post), 1 residual A·x,
        # 1 R, 1 P per level with a coarser level below
        total += 2 * t_s + (t_a + t_p + t_r if lvl.p is not None else 0)
        print(f"# level {i} n={n}: A.mv {t_a*1e3:8.3f}ms  "
              f"smoother {t_s*1e3:8.3f}ms  P {t_p*1e3:8.3f}ms  "
              f"R {t_r*1e3:8.3f}ms", flush=True)
    cs = getattr(mg, "coarse_solver", None)
    if cs is not None:
        n = cs.shape[0]
        t_c = timed(cs.mv, jnp.ones(n, dtype=jnp.float32), reps)
        total += t_c
        print(f"# coarse solve n={n}: {t_c*1e3:.3f}ms", flush=True)
    t_full = timed(mg.mv, jnp.ones(mg.shape[0], dtype=jnp.float32), reps)
    print(f"# sum-of-components estimate {total*1e3:.2f}ms vs full "
          f"V-cycle {t_full*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
