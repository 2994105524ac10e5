"""A/B: compact+clamped WELL layout vs the round-4 record, and
operator-specialized vs argument-passed dispatch for the hybrid SpMV.

The round-4 1M V-cycle of record (100.4 ms) was measured - like the
production >40 MB solve path that falls back to argument-passing at the
HTTP-413 tunnel limit - with operators as jit ARGUMENTS; bench.py's
400 us fine SpMV is operator-SPECIALIZED.  This tool quantifies that gap
on the same matrix, plus the compact-output kernel win.

Usage: python tools/compactbench.py [--side 1024]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_amg.utils.platform import apply_env_platform

    apply_env_platform()
    on_tpu = jax.devices()[0].platform == "tpu"
    reps = args.reps if on_tpu else 2

    from bench import unstructured_fem_system
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.hybrid import try_hybrid_or_well

    t0 = time.perf_counter()
    ap_sp = unstructured_fem_system(args.side)
    print(f"# system n={ap_sp.shape[0]} nnz={ap_sp.nnz} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    csr = CSR.from_scipy(ap_sp)
    x = jnp.ones((ap_sp.shape[0],), dtype=jnp.float32)

    def tspec(mat, x0, label):
        @jax.jit
        def spmv_n(v):
            def body(u, _):
                return mat.mv(u), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        _sync(spmv_n(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(spmv_n(x0))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"# {label}: {best*1e6:.1f}us "
              f"{ap_sp.nnz/best/1e9:.2f}Gnnz/s", flush=True)
        return best

    def targ(mat, x0, label):
        @jax.jit
        def spmv_n(m, v):
            def body(u, _):
                return m.mv(u), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        try:
            _sync(spmv_n(mat, x0))
        except Exception as e:
            print(f"# {label}: FAILED {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)
            return float("inf")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(spmv_n(mat, x0))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"# {label}: {best*1e6:.1f}us "
              f"{ap_sp.nnz/best/1e9:.2f}Gnnz/s", flush=True)
        return best

    # new layout (compact auto-on)
    t0 = time.perf_counter()
    hyb = try_hybrid_or_well(csr, dtype=jnp.float32)
    print(f"# build {time.perf_counter()-t0:.0f}s: {hyb}", flush=True)
    dt_spec = tspec(hyb, x, "compact spec")
    dt_arg = targ(hyb, x, "compact arg ")
    # compact off (round-4 layout)
    t0 = time.perf_counter()
    hyb0 = try_hybrid_or_well(csr, dtype=jnp.float32, compact=False)
    print(f"# build {time.perf_counter()-t0:.0f}s: {hyb0}", flush=True)
    dt0_spec = tspec(hyb0, x, "legacy  spec")
    # bf16 value stream on the new layout
    tspec(hyb.astype_values(jnp.bfloat16), x, "compact bf16")
    print(f"# RESULT compact_spec={dt_spec*1e6:.1f}us "
          f"legacy_spec={dt0_spec*1e6:.1f}us arg_penalty="
          f"{dt_arg/max(dt_spec,1e-12):.2f}x", flush=True)


if __name__ == "__main__":
    main()
