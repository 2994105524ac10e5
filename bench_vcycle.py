"""V-cycle wall-time benchmark (BASELINE.md: "V-cycle wall-time
speed-of-light per-kernel").

Builds the gather-free structured SA multigrid on a 3-D Poisson problem
(default 64³ = 262k dofs) and times one full V-cycle application on the
device, plus its speed-of-light estimate from the sum of per-kernel
minimum traffic at the measured stream rate.

Prints one JSON line (vs_baseline = SOL-estimate / measured; 1.0 means
the cycle runs at the sum-of-kernels roofline).
"""

import json
import sys
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # jax may be pre-imported; env alone is unreliable
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp

    from bench import measure_stream_bandwidth
    from tpu_amg.structured import build_structured_multigrid
    from tpu_amg.utils.problems import poisson3d

    on_tpu = jax.devices()[0].platform != "cpu"
    # NOTE: 96^3 reproducibly faults this session's TPU runtime (worker
    # crash during the fused cycle); 64^3 is stable. Override via env.
    n_grid = int(os.environ.get("TPU_AMG_VCYCLE_GRID", 64 if on_tpu else 24))
    t0 = time.time()
    a = poisson3d(n_grid)
    mg = build_structured_multigrid(
        a, (n_grid,) * 3, coarsest_dim=1500, dtype=jnp.float32
    )
    print(
        f"# setup {time.time()-t0:.1f}s: {len(mg.levels)+1} levels, "
        f"fine n={a.nrows} nnz={a.nnz}",
        file=sys.stderr, flush=True,
    )

    x = jnp.ones(a.nrows, dtype=jnp.float32)
    reps = int(os.environ.get("TPU_AMG_VCYCLE_REPS", 200))

    # operator-specialized executables (DESIGN.md §2) are faster but this
    # session's remote compile service rejects large constant payloads;
    # default to argument-passing, opt into baking with
    # TPU_AMG_VCYCLE_SPECIALIZE=1.
    if os.environ.get("TPU_AMG_VCYCLE_SPECIALIZE"):

        @jax.jit
        def cycle_n(v):
            def body(u, _):
                return mg.mv(u), None

            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        run = cycle_n
    else:

        @jax.jit
        def cycle_n(m, v):
            def body(u, _):
                return m.mv(u), None

            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        def run(v):
            return cycle_n(mg, v)

    _sync(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(x))
        best = min(best, (time.perf_counter() - t0) / reps)

    # mixed-precision cycles (precision.py): bf16 value streams halve the
    # HBM traffic of every level; measure both modes against f32
    from tpu_amg.precision import cast_preconditioner

    best16 = {}
    for mode in ("bf16_values", "bf16"):
        try:
            mg16 = cast_preconditioner(mg, mode)

            @jax.jit
            def cycle16(m, v):
                def body(u, _):
                    return m.mv(u), None

                u, _ = jax.lax.scan(body, v, None, length=reps)
                return u

            _sync(cycle16(mg16, x))
            b16 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(cycle16(mg16, x))
                b16 = min(b16, (time.perf_counter() - t0) / reps)
            best16[mode] = b16
            print(f"# vcycle[{mode}]={b16*1e3:.3f}ms",
                  file=sys.stderr, flush=True)
        except Exception as e:  # env-specific compile limits
            print(f"# vcycle[{mode}] failed: {e}", file=sys.stderr)

    # speed-of-light estimate: every level contributes
    # (pre+post smoothing = 2×deg SpMV passes + transfers + residual)
    bw = measure_stream_bandwidth(jnp, jax, jnp.float32)
    bytes_total = 0
    for lvl in mg.levels:
        n = lvl.a.shape[0]
        mat = getattr(lvl.a, "ell", None)
        nnz = getattr(mat, "nnz", n * n if mat is None else 7 * n)
        spmv_bytes = 4 * nnz + 8 * n
        # chebyshev degree-3 pre+post = 6 SpMVs + residual + 2 transfer
        # SpMV-equivalents (lazy smoothed P/R each contain one fine SpMV)
        bytes_total += 9 * spmv_bytes
    sol = bytes_total / bw

    print(
        f"# vcycle={best*1e3:.3f}ms sol={sol*1e3:.3f}ms bw={bw/1e9:.0f}GB/s",
        file=sys.stderr, flush=True,
    )
    solve_bench(mg, a, jax, jnp)
    out = {
        "metric": f"vcycle_wall_time_3d_poisson_{n_grid}cubed",
        "value": round(best * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(sol / best, 4),
    }
    for mode, b16 in best16.items():
        out[f"value_{mode}"] = round(b16 * 1e3, 4)
    print(json.dumps(out))


def solve_bench(mg, a, jax, jnp):
    """Full AMG-PCG solve wall time (secondary metric, stderr)."""
    from tpu_amg.linop import SparseOperator
    from tpu_amg.solvers import cg

    op = SparseOperator.from_csr(
        a, dtype=jnp.float32, dia_max_diags=160, dia_max_density=8.0
    )
    b = jnp.ones(a.nrows, dtype=jnp.float32)

    @jax.jit
    def solve(b):
        x, info = cg(op, b, mg, rtol=1e-6, maxiter=100)
        return x, info.iters, info.final_res

    x, iters, res = solve(b)
    _sync(x)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x, iters, res = solve(b)
        _sync(x)
        dt = min(dt, time.perf_counter() - t0)
    print(
        f"# full PCG solve: {dt*1e3:.1f}ms, {int(iters)} iters, "
        f"res {float(res):.2e}",
        file=sys.stderr, flush=True,
    )

    # same solve with a bf16-valued preconditioner cycle (f32 outer CG;
    # bf16_values is the measured-fastest cycle mode on TPU)
    from tpu_amg.precision import cast_preconditioner

    try:
        mg16 = cast_preconditioner(mg, "bf16_values")

        @jax.jit
        def solve16(b):
            x, info = cg(op, b, mg16, rtol=1e-6, maxiter=100)
            return x, info.iters, info.final_res

        x, iters, res = solve16(b)
        _sync(x)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x, iters, res = solve16(b)
            _sync(x)
            best = min(best, time.perf_counter() - t0)
        print(
            f"# full PCG solve[bf16_values cycle]: {best*1e3:.1f}ms, "
            f"{int(iters)} iters, res {float(res):.2e}",
            file=sys.stderr, flush=True,
        )
    except Exception as e:
        print(f"# bf16 solve failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
