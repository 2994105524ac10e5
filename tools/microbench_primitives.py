"""Microbenchmark Mosaic/VPU primitive costs on the session TPU (dev
harness; informs the WELL kernel redesign — not shipped API).

Each case runs a Pallas kernel that applies one primitive `inner` times
per grid step over a (8,128) f32 vreg, grid `tiles`, so per-op cost =
time / (tiles*inner).  A `baseline` kernel with the same memory traffic
but minimal compute is subtracted.

Usage: python tools/microbench_primitives.py [case ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

TILES = 4096
INNER = 64


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def timed(fn, *args, reps=5):
    fn = jax.jit(fn)
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_case(name, body, dtype=jnp.float32, idx_dtype=jnp.int32,
             tiles=TILES, inner=INNER, sub=16, lanes=128):
    """body(x, idx, i) -> x'  applied `inner` times in the kernel."""

    def kernel(x_ref, i_ref, o_ref):
        x = x_ref[0]
        idx = i_ref[0]
        for i in range(inner):
            x = body(x, idx, i)
        o_ref[0] = x

    def blk(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    x = jnp.ones((tiles, sub, lanes), dtype)
    idx = jnp.zeros((tiles, sub, lanes), idx_dtype)

    def call(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tiles, sub, lanes), dtype),
            grid_spec=pl.GridSpec(
                grid=(tiles,), in_specs=[blk((sub, lanes))] * 2,
                out_specs=blk((sub, lanes)),
            ),
        )(x, idx)

    with jax.enable_x64(False):
        dt = timed(call, x, idx)
    per_op_ns = dt / (tiles * inner) * 1e9
    print(f"{name:34s} {dt*1e6:9.1f}us  {per_op_ns:7.3f} ns/op "
          f"({per_op_ns*0.94:6.2f} cyc @940MHz)", flush=True)
    return per_op_ns


def main():
    sel = set(sys.argv[1:])

    def want(n):
        return not sel or any(s in n for s in sel)

    # memory/loop floor: one add per iteration
    if want("add"):
        run_case("add (floor)", lambda x, i, k: x + 1.0)
    if want("mul_add"):
        run_case("fma a*x+b", lambda x, i, k: x * 1.0001 + 1.0)
    if want("select"):
        run_case("where(select)", lambda x, i, k: jnp.where(i > 0, x, x + 1))
    if want("roll1"):
        run_case("roll lanes by 1",
                 lambda x, i, k: pltpu.roll(x, 127, 1))
    if want("roll_sub"):
        run_case("roll sublanes by 1",
                 lambda x, i, k: pltpu.roll(x, 1, 0))
    if want("lane_gather"):
        run_case("lane gather (16,128) i32idx",
                 lambda x, i, k: jnp.take_along_axis(x, i, axis=-1))
    if want("lane_gather8"):
        run_case("lane gather (8,128)",
                 lambda x, i, k: jnp.take_along_axis(x, i, axis=-1), sub=8)
    if want("sub_gather"):
        run_case("sublane gather (8,128)",
                 lambda x, i, k: jnp.take_along_axis(x, i % 8, axis=0),
                 sub=8)
    if want("both_gather"):
        def both(x, i, k):
            r = jnp.take_along_axis(x, i % 8, axis=0)
            return jnp.take_along_axis(r, i, axis=-1)
        run_case("sub+lane gather pair (8,128)", both, sub=8)
    if want("bf16_lane"):
        run_case("lane gather bf16 (16,128)",
                 lambda x, i, k: jnp.take_along_axis(x, i, axis=-1),
                 dtype=jnp.bfloat16, sub=16)
    if want("bf16_sub"):
        run_case("sublane gather bf16 (16,128)",
                 lambda x, i, k: jnp.take_along_axis(x, i % 16, axis=0),
                 dtype=jnp.bfloat16, sub=16)
    if want("masked_store"):
        def ms(x, i, k):
            return jnp.where(i == k % 8, x + 1.0, x)
        run_case("masked accumulate", ms)
    if want("i8upcast"):
        def up(x, i, k):
            return x + i.astype(jnp.float32)
        run_case("int8->f32 cast+add", up, idx_dtype=jnp.int8)
    if want("cmp"):
        run_case("compare eq", lambda x, i, k: x + (i == k).astype(x.dtype))

    # XLA-side: row-gather throughput for table pre-staging
    if want("xla_gather"):
        for rows, width in ((2048, 128), (262144, 128), (262144, 8)):
            nv = 2344 * 8
            src = jnp.ones((rows, width), jnp.float32)
            ids = jnp.asarray(
                np.random.default_rng(0).integers(0, rows, nv), jnp.int32
            )

            def g(src, ids):
                def body(c, _):
                    s, i = c
                    out = jnp.take(s, i, axis=0)
                    return (s, i + out[0, :1].astype(jnp.int32) * 0), None

                (s, i), _ = jax.lax.scan(g_body, (src, ids), None, length=50)
                return i

            def g_body(c, _):
                s, i = c
                out = jnp.take(s, i, axis=0)
                return (s, (i + out[:, :1].astype(jnp.int32).ravel() * 0)), None

            def gg(src, ids):
                (s, i), _ = jax.lax.scan(g_body, (src, ids), None, length=50)
                return i

            dt = timed(gg, src, ids) / 50
            gb = nv * width * 4 / dt / 1e9
            print(f"xla row-gather {rows}x{width} -> {nv} rows: "
                  f"{dt*1e6:8.1f}us  {gb:6.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
