"""Attribute well_spmv wrapper overhead vs the raw kernel (dev harness).

Usage: python tools/welle2e.py [side] [reps]
"""
import dataclasses
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def timeit(fn, x, reps):
    @jax.jit
    def rep(v):
        def body(u, _):
            return fn(u), None
        u, _ = jax.lax.scan(body, v, None, length=reps)
        return u
    _sync(rep(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(rep(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    from bench import unstructured_fem_system
    from tpu_amg.ops.well_pallas import well_spmv
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.well import WELL

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    ap = unstructured_fem_system(side)
    well = WELL.from_csr(CSR.from_scipy(ap), dtype=jnp.float32)
    print(f"# {well}", flush=True)
    n = ap.shape[0]
    x = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)

    well0 = dataclasses.replace(
        well,
        extra_rows=well.extra_rows[:0],
        extra_cols=well.extra_cols[:0],
        extra_vals=well.extra_vals[:0],
    )
    nnz = ap.nnz
    w16 = well.astype_values(jnp.bfloat16)
    y32 = np.asarray(well_spmv(well, x))
    y16 = np.asarray(well_spmv(w16, x))
    ref = ap @ np.asarray(x, np.float64)
    print(f"# err f32 {np.abs(y32-ref).max()/np.abs(ref).max():.2e} "
          f"bf16v {np.abs(y16-ref).max()/np.abs(ref).max():.2e}",
          flush=True)
    for name, fn in (
        ("well_spmv full", lambda v: well_spmv(well, v)),
        ("well_spmv no-extras", lambda v: well_spmv(well0, v)),
        ("well_spmv bf16 values", lambda v: well_spmv(w16, v)),
    ):
        dt = timeit(fn, x, reps)
        print(f"# {name:22s} {dt*1e6:8.1f}us {nnz/dt/1e9:6.2f} Gnnz/s",
              flush=True)


if __name__ == "__main__":
    main()
