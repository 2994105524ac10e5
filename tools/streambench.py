"""Pallas pipeline stream-bandwidth microbench (dev harness).

The WELL kernel ablation shows the kernel is stream-bound: slabs move at
~200 GB/s through the pallas input pipeline vs 819 GB/s STREAM.  This
isolates WHY: block size, input count, dtype, and output width are swept
independently on a pure pass-through kernel.

Usage: python tools/streambench.py [case-substr ...]
"""
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_amg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

TOTAL = 32 * 1024 * 1024  # bytes to stream per run


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def run_case(name, n_inputs, rows, dtype, out_width=128, reps=400):
    """n_inputs blocks of (rows, 128) dtype per tile; passthrough sum."""
    isz = jnp.dtype(dtype).itemsize
    per_tile = n_inputs * rows * 128 * isz
    tiles = max(TOTAL // per_tile, 1)

    def kernel(*refs):
        # first ref is the scan carry (defeats loop hoisting of the
        # whole pallas_call — without it every rep after the first is
        # CSE'd away and the bench just measures the 30ms call overhead)
        c_ref, ins, out = refs[0], refs[1:-1], refs[-1]
        acc = c_ref[0:8, :].astype(jnp.float32)
        for r in ins:
            # touch every sublane-block of the input so nothing is DCE'd
            for k in range(0, rows, 8):
                acc = acc + r[0, k:k + 8, :].astype(jnp.float32)
        out[0, 0:8, :] = acc[:, :out_width]

    def blk(shape, d=None):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.integers(0, 100, (tiles, rows, 128)), dtype)
            for _ in range(n_inputs)]

    @jax.jit
    def go(*args):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((tiles, 8, out_width),
                                               jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                    + [blk((rows, 128)) for _ in range(n_inputs)],
                    out_specs=blk((8, out_width)),
                ),
            )(c, *args)
            return out[0, 0:8, :128], None
        c, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.float32), None,
                            length=reps)
        return c

    with jax.enable_x64(False):
        _sync(go(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(go(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
    tot = tiles * per_tile
    print(f"{name:44s} tiles={tiles:5d} blk={per_tile//1024:5d}KB "
          f"{best*1e6:8.1f}us  {tot/best/1e9:6.1f} GB/s", flush=True)


def run_wide(name, n_inputs, sub, width, dtype, reps=400, cost=False):
    """DIA-style layout: array (sub, tiles*width), block (sub, width) —
    wide LANE dim instead of stacked sublanes."""
    isz = jnp.dtype(dtype).itemsize
    per_tile = n_inputs * sub * width * isz
    tiles = max(TOTAL // per_tile, 1)

    def kernel(*refs):
        c_ref, ins, out = refs[0], refs[1:-1], refs[-1]
        acc = c_ref[0:8, :].astype(jnp.float32)
        for r in ins:
            for s in range(0, sub, 8):
                for k in range(0, width, 128):
                    acc = acc + r[s:s + 8, k:k + 128].astype(jnp.float32)
        out[0:8, :] = acc

    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.integers(0, 100, (sub, tiles * width)), dtype)
            for _ in range(n_inputs)]
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=tiles * per_tile // isz, bytes_accessed=tiles * per_tile,
            transcendentals=0)

    @jax.jit
    def go(*args):
        def body(c, _):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                    + [pl.BlockSpec((sub, width), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
                       for _ in range(n_inputs)],
                    out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                ),
                **kw,
            )(c, *args)
            return out, None
        c, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.float32), None,
                            length=reps)
        return c

    with jax.enable_x64(False):
        _sync(go(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(go(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
    tot = tiles * per_tile
    print(f"{name:44s} tiles={tiles:5d} blk={per_tile//1024:5d}KB "
          f"{best*1e6:8.1f}us  {tot/best/1e9:6.1f} GB/s", flush=True)


def main():
    sel = set(sys.argv[1:])

    def want(n):
        return not sel or any(s in n for s in sel)

    cases = [
        ("f32 1in rows=512", 1, 512, jnp.float32),
        ("f32 1in rows=64", 1, 64, jnp.float32),
        ("f32 1in rows=2048", 1, 2048, jnp.float32),
        ("int8 1in rows=512", 1, 512, jnp.int8),
        ("int8 1in rows=2048", 1, 2048, jnp.int8),
        ("f32 7in rows=64 (WELL-shape)", 7, 64, jnp.float32),
        ("f32 7in rows=512", 7, 512, jnp.float32),
        ("int8 7in rows=512", 7, 512, jnp.int8),
    ]
    for name, ni, rows, dt in cases:
        if want(name):
            try:
                run_case(name, ni, rows, dt)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

    wide_cases = [
        ("wide f32 1in 8x8192", 1, 8, 8192, jnp.float32, False),
        ("wide f32 1in 8x8192 +cost", 1, 8, 8192, jnp.float32, True),
        ("wide f32 1in 8x32768", 1, 8, 32768, jnp.float32, False),
        ("wide f32 1in 64x8192", 1, 64, 8192, jnp.float32, False),
        ("wide int8 1in 32x8192", 1, 32, 8192, jnp.int8, False),
        ("wide f32 7in 8x4096", 7, 8, 4096, jnp.float32, False),
    ]
    for name, ni, sub, width, dt, cost in wide_cases:
        if want(name):
            try:
                run_wide(name, ni, sub, width, dt, cost=cost)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
