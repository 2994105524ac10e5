"""Benchmark driver: SpMV throughput on a ~1M-dof 3-D Poisson system.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: ELL SpMV throughput in nnz/s on the largest hot kernel of the
solve phase (BASELINE.md: SpMV ≥ 70% of roofline nnz/s per chip).
``vs_baseline`` = measured / (0.70 × roofline), where roofline =
measured-stream-bandwidth / bytes-per-nnz — so 1.0 means exactly the 70%
target and >1 beats it.
"""

import json
import os
import sys
import time

import numpy as np


def _sync(x):
    """Force completion: pull one element to the host (block_until_ready
    is unreliable over remote device tunnels)."""
    return float(np.asarray(x.ravel()[0]))


def measure_stream_bandwidth(jnp, jax, dtype, reps=200, trials=3):
    """Classic STREAM triad: HBM-resident working set (256 MB — far
    beyond VMEM), chained inside one executable.  This is the roofline
    denominator in the usual sense (HBM-bandwidth-bound SpMV).
    Min-of-trials to shrug off noisy neighbors on shared devices."""
    n = 32 * 1024 * 1024  # 2 × 128 MB f32 arrays
    x = jnp.ones((n,), dtype=dtype)
    y = jnp.full((n,), 2.0, dtype=dtype)

    @jax.jit
    def triad_n(x, y):
        def body(v, _):
            return v + 0.5 * y, None
        v, _ = jax.lax.scan(body, x, None, length=reps)
        return v

    _sync(triad_n(x, y))  # warmup/compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(triad_n(x, y))
        best = min(best, (time.perf_counter() - t0) / reps)
    bytes_moved = 3 * n * np.dtype(np.float32).itemsize
    return bytes_moved / best


def unstructured_fem_system(side, seed=0):
    """Pseudo-unstructured 2-D FEM Laplacian: jittered grid points,
    randomly renumbered, Delaunay-triangulated, then RCM-reordered —
    the matrix class the reference's MFEM loader exists for
    (reference utils.rs:269-350) and the hard case for TPU SpMV."""
    import scipy.sparse as sps
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    n_pts = side * side
    gx, gy = np.meshgrid(np.arange(side, dtype=np.float64),
                         np.arange(side, dtype=np.float64))
    pts = np.stack([gx.ravel(), gy.ravel()], 1)
    pts += rng.uniform(-0.35, 0.35, pts.shape)
    tri = Delaunay(pts[rng.permutation(n_pts)])
    e = np.concatenate([tri.simplices[:, [0, 1]], tri.simplices[:, [1, 2]],
                        tri.simplices[:, [2, 0]]])
    i = np.concatenate([e[:, 0], e[:, 1]])
    j = np.concatenate([e[:, 1], e[:, 0]])
    a = sps.coo_matrix((np.ones(len(i)), (i, j)),
                       shape=(n_pts, n_pts)).tocsr()
    a.sum_duplicates()
    a.data[:] = -1.0
    a = (a + sps.diags(np.asarray(-a.sum(axis=1)).ravel() + 1e-8)).tocsr()
    p = reverse_cuthill_mckee(a, symmetric_mode=True)
    ap = a[p][:, p].tocsr()
    ap.sort_indices()
    return ap


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # keep x64 off for the bench: the solve-phase dtype on TPU is f32
    from tpu_amg.sparse import ELL
    from tpu_amg.utils.problems import poisson3d

    from tpu_amg.sparse.dia import try_from_csr

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n_grid = 100 if on_tpu else 48
    a = poisson3d(n_grid)  # 7-point stencil
    n = a.nrows
    nnz = a.nnz
    x = jnp.ones((n,), dtype=jnp.float32)

    def time_spmv(mat, reps=2000, trials=3, x0=None):
        """Operator-specialized executable: the matrix is closed over
        (a compile-time constant), letting XLA pre-stage/pin its layout —
        measured ~8x faster than passing it as an argument, and exactly
        how a production solve specializes to its system matrix."""
        x0 = x if x0 is None else x0

        @jax.jit
        def spmv_n(v):
            def body(u, _):
                return mat.mv(u), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        _sync(spmv_n(x0))  # warmup/compile
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            _sync(spmv_n(x0))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    def time_spmv_fn(fn, x0, reps=500):
        @jax.jit
        def spmv_n(v):
            def body(u, _):
                return fn(u), None
            u, _ = jax.lax.scan(body, v, None, length=reps)
            return u

        _sync(spmv_n(x0))
        t0 = time.perf_counter()
        _sync(spmv_n(x0))
        return (time.perf_counter() - t0) / reps

    dia_probe = try_from_csr(a, dtype=jnp.float32)
    dt_ell = float("inf")
    if os.environ.get("TPU_AMG_BENCH_ELL") or dia_probe is None:
        # the gather-path is never competitive on TPU and compiles very
        # slowly over remote tunnels; opt-in only
        print("# building ELL...", file=sys.stderr, flush=True)
        ell = ELL.from_csr(a, dtype=jnp.float32)
        print("# timing ELL spmv...", file=sys.stderr, flush=True)
        dt_ell = time_spmv(ell, reps=100, trials=1)
    print(f"# ell {dt_ell*1e3:.3f}ms; building DIA...", file=sys.stderr, flush=True)
    dia = try_from_csr(a, dtype=jnp.float32)
    dt_dia = time_spmv(dia) if dia is not None else float("inf")
    # bf16 value stream (x/y stay f32, FMAs accumulate f32): halves the
    # dominant traffic term — the production mixed-precision cycle mode
    dt_dia16 = (
        time_spmv(dia.astype(jnp.bfloat16)) if dia is not None
        else float("inf")
    )
    print(f"# dia {dt_dia*1e3:.3f}ms bf16v {dt_dia16*1e3:.3f}ms; "
          f"trying pallas...", file=sys.stderr, flush=True)
    dt_pallas = float("inf")
    if dia is not None and not os.environ.get("TPU_AMG_BENCH_NO_PALLAS"):
        # hardware-validated round 2 (119.6 Gnnz/s on the v5e tunnel);
        # kept opt-out in case a session's Mosaic service is down
        try:
            import dataclasses

            from tpu_amg.ops.dia_pallas import TILE, dia_spmv_pallas

            n_pad = ((n + TILE - 1) // TILE) * TILE
            if n_pad != n:
                dia_p = dataclasses.replace(
                    dia,
                    data=jnp.pad(dia.data, ((0, 0), (0, n_pad - n))),
                    shape=(n_pad, n_pad),
                )
            else:
                dia_p = dia

            class _P:
                nrows = n_pad
                _pad = dia._pad
                data = dia_p.data
                offsets = dia.offsets

            xq = jnp.pad(x, (0, n_pad - n))
            dt_pallas = time_spmv_fn(
                lambda v: dia_spmv_pallas(_P, v, interpret=not on_tpu), xq
            )
        except Exception as e:
            print(f"# pallas unavailable: {e}", file=sys.stderr, flush=True)
    print(
        f"# pallas {dt_pallas*1e3:.3f}ms; measuring bandwidth...",
        file=sys.stderr, flush=True,
    )
    dt = min(dt_ell, dt_dia, dt_pallas)
    fmt = {dt_ell: "ell", dt_dia: "dia", dt_pallas: "pallas-dia"}[dt]
    nnz_per_s = nnz / dt

    # roofline: lower bound on traffic for ANY SpMV = values once + x once
    # + y once (index streams are format overhead we aim to eliminate)
    bytes_min = 4 * nnz + 4 * n + 4 * n
    bw = measure_stream_bandwidth(jnp, jax, jnp.float32)
    roofline_nnz_s = nnz * bw / bytes_min
    target = 0.70 * roofline_nnz_s

    print(
        f"# device={dev.platform} n={n} nnz={nnz} fmt={fmt} "
        f"ell={dt_ell*1e3:.3f}ms dia={dt_dia*1e3:.3f}ms "
        f"pallas={dt_pallas*1e3:.3f}ms "
        f"bw={bw/1e9:.0f}GB/s roofline={roofline_nnz_s/1e9:.2f}Gnnz/s",
        file=sys.stderr,
    )

    # ---- unstructured FEM SpMV (WELL kernel, sparse/well.py) ---------
    un = {}
    try:
        side = 1024 if on_tpu else 128
        print("# building unstructured system...", file=sys.stderr, flush=True)
        ap = unstructured_fem_system(side)
        from tpu_amg.sparse.csr import CSR
        from tpu_amg.sparse.hybrid import try_hybrid_or_well

        well = try_hybrid_or_well(CSR.from_scipy(ap), dtype=jnp.float32)
        assert well is not None
        print(f"# {well}", file=sys.stderr, flush=True)
        xu = jnp.ones((ap.shape[0],), dtype=jnp.float32)
        print("# timing unstructured spmv...", file=sys.stderr, flush=True)
        dt_un = time_spmv(well, reps=400 if on_tpu else 3,
                          trials=3 if on_tpu else 1, x0=xu)
        # bf16 value stream (production mixed-precision cycle mode):
        # the kernel is partly stream-bound, so halving the dominant
        # data slab pays directly
        dt_un16 = time_spmv(
            well.astype_values(jnp.bfloat16), reps=400 if on_tpu else 3,
            trials=3 if on_tpu else 1, x0=xu,
        )
        un_roofline = ap.nnz * bw / (4 * ap.nnz + 8 * ap.shape[0])
        un = {
            "unstructured_gnnzs": round(ap.nnz / dt_un / 1e9, 4),
            "unstructured_bf16v_gnnzs": round(ap.nnz / dt_un16 / 1e9, 4),
            "unstructured_vs_target": round(
                (ap.nnz / dt_un) / (0.70 * un_roofline), 4
            ),
        }
        print(
            f"# unstructured n={ap.shape[0]} nnz={ap.nnz} "
            f"well={dt_un*1e6:.1f}us {un}",
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"# unstructured bench skipped: {e}", file=sys.stderr)

    extra = {}
    if np.isfinite(dt_dia16):
        extra["bf16_values_gnnzs"] = round(nnz / dt_dia16 / 1e9, 4)
    print(
        json.dumps(
            {
                "metric": "spmv_throughput_3d_poisson_1M",
                "value": round(nnz_per_s / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_per_s / target, 4),
                **extra,
                **un,
            }
        )
    )


if __name__ == "__main__":
    # one retry: shared-tunnel TPU workers occasionally crash/restart
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"# first attempt failed ({e}); retrying once", file=sys.stderr)
        time.sleep(30)
        main()
