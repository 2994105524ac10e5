"""Focused WELL SpMV bench (TPU) — scratch harness, not shipped."""
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

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    on_tpu = jax.devices()[0].platform != "cpu"
    t0 = time.perf_counter()
    ap = unstructured_fem_system(side)
    print(f"# built {time.perf_counter()-t0:.1f}s", flush=True)
    well = WELL.from_csr(CSR.from_scipy(ap), dtype=jnp.float32)
    print(f"# {well}", flush=True)
    gb = np.asarray(well.gb).reshape(-1, 3)
    spans = gb[:, 1] - gb[:, 0] + 1
    print(f"# vreg group-span: med {np.median(spans)} mean {spans.mean():.1f}"
          f" max {spans.max()}; passes med {np.median(gb[:, 2])}"
          f" mean {gb[:, 2].mean():.2f} max {gb[:, 2].max()}", flush=True)

    x = jnp.ones((ap.shape[0],), dtype=jnp.float32)
    modes = (False, True) if on_tpu else (False,)
    if "nodma" in sys.argv:
        modes = (False,)
    for mode in modes:
        reps = 400 if on_tpu else 3

        @jax.jit
        def spmv_n(v):
            def body(u, _):
                return well_spmv(well, u, interpret=not on_tpu,
                                 dma_window=mode), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        try:
            _sync(spmv_n(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(spmv_n(x))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(f"# dma_window={mode}: {best*1e6:.1f}us "
                  f"{ap.nnz/best/1e9:.2f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"# dma_window={mode} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # correctness spot check
    y = np.asarray(well_spmv(well, x, interpret=not on_tpu))
    ref = ap @ np.ones(ap.shape[0])
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"# max rel err vs scipy: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
