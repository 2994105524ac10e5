"""A/B harness for WELL kernel variants (dev A/B harness).
Usage: python scratch_wellmodes.py [side] [reps]"""
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import numpy as np


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench import unstructured_fem_system
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.well import WELL
    from tpu_amg.ops.well_pallas import well_spmv

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    on_tpu = jax.devices()[0].platform != "cpu"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else (200 if on_tpu else 2)
    ap = unstructured_fem_system(side)
    well = WELL.from_csr(CSR.from_scipy(ap), dtype=jnp.float32)
    print(f"# {well}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=ap.shape[0]),
                    jnp.float32)
    ref = ap @ np.asarray(x, np.float64)
    scale = np.abs(ref).max()

    for mode in (0, 1, 2):
        try:
            y = np.asarray(well_spmv(well, x, interpret=not on_tpu,
                                     mode=mode))
            err = np.abs(y - ref).max() / scale
            @jax.jit
            def spmv_n(v, mode=mode):
                def body(u, _):
                    return well_spmv(well, u, interpret=not on_tpu,
                                     mode=mode), None
                u, _ = jax.lax.scan(body, v, None, length=reps)
                return u
            _sync(spmv_n(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(spmv_n(x))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(f"# mode={mode}: err={err:.2e} {best*1e6:.1f}us "
                  f"{ap.nnz/best/1e9:.2f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"# mode={mode} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
