"""Single-chip cost of the SHARDED layouts vs their single-device
forms: builds the 1M 2-D bench system as HybridDiaWell / WELL and as
HaloHybrid / HaloWELL on a 1-device mesh (ring exchange degenerates to
padding), then times both on the real chip.

This isolates what the distributed LAYOUT itself costs (stacked-shard
arrays, shard_map dispatch, halo padding) from ICI communication —
the only sharded-vs-single comparison a 1-chip environment can measure
(VERDICT r4 weak #4: HaloWELL "has never been timed on TPU hardware").

Usage: python tools/halobench.py [--side 1024]
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
    from tpu_amg.parallel import make_solver_mesh
    from tpu_amg.parallel.halo import HaloHybrid, HaloWELL
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.hybrid import try_hybrid_or_well
    from tpu_amg.sparse.well import WELL

    t0 = time.perf_counter()
    ap_sp = unstructured_fem_system(args.side)
    csr = CSR.from_scipy(ap_sp)
    n = csr.nrows
    print(f"# system n={n} nnz={csr.nnz} ({time.perf_counter()-t0:.0f}s)",
          flush=True)
    x = jnp.ones((n,), dtype=jnp.float32)

    def tspec(mat, label):
        @jax.jit
        def spmv_n(v):
            def body(u, _):
                return mat.mv(u), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        _sync(spmv_n(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(spmv_n(x))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"# {label}: {best*1e6:.1f}us "
              f"{csr.nnz/best/1e9:.2f}Gnnz/s", flush=True)
        return best

    mesh = make_solver_mesh(1)
    jax.set_mesh(mesh)

    t0 = time.perf_counter()
    single = try_hybrid_or_well(csr, dtype=jnp.float32)
    print(f"# single build {time.perf_counter()-t0:.0f}s: {single}",
          flush=True)
    dt_single = tspec(single, "single  HybridDiaWell")

    t0 = time.perf_counter()
    halo = HaloHybrid.from_csr(csr, mesh, "x", dtype=jnp.float32)
    print(f"# halo build {time.perf_counter()-t0:.0f}s: {halo}", flush=True)
    print(f"#   halo well: block={halo.well.block} "
          f"g={halo.well.rows_per_vrow} idroute={halo.well.idroute} "
          f"n_ex_groups={halo.well.n_ex_groups}", flush=True)
    dt_halo = tspec(halo, "sharded HaloHybrid   ")
    print(f"# RESULT sharded_layout_overhead="
          f"{(dt_halo/dt_single - 1)*100:.1f}%", flush=True)

    # plain WELL vs HaloWELL (no hybrid split) for the format-level view
    t0 = time.perf_counter()
    w1 = WELL.from_csr(csr, dtype=jnp.float32, block=4)
    print(f"# plain WELL build {time.perf_counter()-t0:.0f}s: {w1}",
          flush=True)
    dtw = tspec(w1, "single  WELL         ")
    t0 = time.perf_counter()
    hw = HaloWELL.from_csr(csr, mesh, "x", dtype=jnp.float32, block=4)
    print(f"# HaloWELL build {time.perf_counter()-t0:.0f}s", flush=True)
    dth = tspec(hw, "sharded HaloWELL     ")
    print(f"# RESULT well_layout_overhead={(dth/dtw - 1)*100:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
