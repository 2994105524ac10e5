"""Manual-DMA bandwidth envelope (dev harness).

The Pallas *auto* pipeline (blocked in_specs, 2-deep) sustains only
~100 GB/s on this v5e — not enough in-flight bytes to cover DMA latency.
This sweeps a hand-rolled HBM→VMEM ring pipeline (depth D, chunk C) on a
grid=(1,) kernel to find the envelope the WELL kernel should target.

Usage: python tools/dmabench.py
"""
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

TOTAL_MB = 32


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def run_case(depth, rows, touch=True, reps=400):
    """Ring of `depth` buffers of (rows, 128) f32, one loop over chunks."""
    n_rows_total = TOTAL_MB * 1024 * 1024 // (128 * 4)
    n_chunks = n_rows_total // rows
    x = jnp.ones((n_rows_total, 128), jnp.float32)

    def kernel(c_ref, x_hbm, o_ref, bufs, sems):
        def dma(i, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * rows, rows), :],
                bufs.at[pl.ds(slot * rows, rows), :],
                sems.at[slot],
            )

        for i in range(depth):
            dma(i, i).start()

        def body(i, acc):
            slot = jax.lax.rem(i, depth)
            dma(i, slot).wait()
            if touch:
                acc = acc + bufs[pl.ds(slot * rows, 8), :]

            @pl.when(i + depth < n_chunks)
            def _():
                dma(i + depth, slot).start()

            return acc

        # carry input defeats loop hoisting of the whole pallas_call
        acc = jax.lax.fori_loop(0, n_chunks, body, c_ref[:])
        o_ref[:] = acc

    @jax.jit
    def go(x):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((depth * rows, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(c, x)
            return out, None

        c, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.float32), None,
                            length=reps)
        return c

    with jax.enable_x64(False):
        _sync(go(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(go(x))
            best = min(best, (time.perf_counter() - t0) / reps)
    tot = n_chunks * rows * 128 * 4
    print(f"depth={depth:2d} rows={rows:5d} ({rows * 512 // 1024:5d}KB) "
          f"inflight={depth * rows * 512 // 1024:6d}KB  {best * 1e6:8.1f}us "
          f"{tot / best / 1e9:6.1f} GB/s", flush=True)


def main():
    for depth, rows in (
        (2, 512), (4, 512), (8, 512),
        (2, 2048), (4, 2048), (8, 2048),
        (2, 8192), (4, 8192),
        (16, 512), (16, 128), (8, 128),
    ):
        try:
            run_case(depth, rows)
        except Exception as e:
            print(f"depth={depth} rows={rows} FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
