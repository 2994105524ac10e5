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
import sys
import time

import numpy as np


def measure_stream_bandwidth(jnp, jax, dtype):
    """Effective HBM bandwidth via a large fused triad (2 reads+1 write)."""
    n = 32 * 1024 * 1024  # 128 MB per f32 array
    x = jnp.ones((n,), dtype=dtype)
    y = jnp.full((n,), 2.0, dtype=dtype)

    @jax.jit
    def triad(x, y):
        return x + 0.5 * y

    triad(x, y).block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = triad(x, y)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    bytes_moved = 3 * n * np.dtype(np.float32).itemsize
    return bytes_moved / dt


def main():
    import jax
    import jax.numpy as jnp

    # keep x64 off for the bench: the solve-phase dtype on TPU is f32
    from tpu_amg.sparse import ELL
    from tpu_amg.utils.problems import poisson3d

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n_grid = 100 if on_tpu else 48
    a = poisson3d(n_grid)  # 7-point stencil
    ell = ELL.from_csr(a, dtype=jnp.float32)
    n = ell.nrows

    x = jnp.ones((n,), dtype=jnp.float32)
    spmv = jax.jit(lambda e, v: e.mv(v))
    spmv(ell, x).block_until_ready()

    reps = 50
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = spmv(ell, y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    nnz_per_s = ell.nnz / dt

    # roofline: ELL row pass moves data(4B) + cols(4B) per padded slot,
    # + x gather (4B per slot, assuming no reuse) + y write (4B per row)
    bw = measure_stream_bandwidth(jnp, jax, jnp.float32)
    slots = n * ell.k
    bytes_per_spmv = 4 * slots * 3 + 4 * n
    roofline_nnz_s = ell.nnz * bw / bytes_per_spmv
    target = 0.70 * roofline_nnz_s

    print(
        f"# device={dev.platform} n={n} nnz={ell.nnz} k={ell.k} "
        f"spmv={dt*1e3:.3f}ms bw={bw/1e9:.0f}GB/s "
        f"roofline={roofline_nnz_s/1e9:.2f}Gnnz/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "spmv_throughput_3d_poisson_1M",
                "value": round(nnz_per_s / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_per_s / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
