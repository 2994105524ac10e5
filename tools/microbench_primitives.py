"""Microbenchmark Mosaic/VPU primitive THROUGHPUT on the session TPU
(dev harness; informs the WELL kernel redesign — not shipped API).

Each case accumulates `inner` INDEPENDENT applications of one primitive
(indices vary per iteration so nothing CSEs/folds) into one result, so
ILP can hide latency and we measure issue throughput.  Cost is the
marginal time between inner=LO and inner=HI over TILES grid steps.

Usage: python tools/microbench_primitives.py [case-substr ...]
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

TILES = 4096
NIDX = 8  # distinct index arrays cycled through to defeat CSE
LO, HI = 16, 272


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def timed(fn, *args, reps=8):
    fn = jax.jit(fn)
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_case(name, body, dtype=jnp.float32, idx_dtype=jnp.int32,
             tiles=TILES, sub=8, lanes=128, idx_max=None):
    """body(x, idx, k) -> contribution; kernel sums contributions."""
    if idx_max is None:
        idx_max = sub

    def make_kernel(inner):
        def kernel(x_ref, i_ref, o_ref):
            x = x_ref[0]
            acc = x * 0.0
            for k in range(inner):
                acc += body(x, i_ref[0, k % NIDX], k)
            o_ref[0] = acc
        return kernel

    def blk(shape):
        return pl.BlockSpec((1,) + shape, lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((tiles, sub, lanes)), dtype)
    idx = jnp.asarray(
        rng.integers(0, idx_max, (tiles, NIDX, sub, lanes)), idx_dtype
    )

    def call(inner, x, idx):
        return pl.pallas_call(
            make_kernel(inner),
            out_shape=jax.ShapeDtypeStruct((tiles, sub, lanes), dtype),
            grid_spec=pl.GridSpec(
                grid=(tiles,),
                in_specs=[blk((sub, lanes)), blk((NIDX, sub, lanes))],
                out_specs=blk((sub, lanes)),
            ),
        )(x, idx)

    with jax.enable_x64(False):
        d1 = timed(lambda a, b: call(LO, a, b), x, idx)
        d2 = timed(lambda a, b: call(HI, a, b), x, idx)
    per = (d2 - d1) / (tiles * (HI - LO)) * 1e9
    print(f"{name:36s} lo={d1*1e3:7.2f}ms hi={d2*1e3:7.2f}ms  "
          f"{per:7.3f} ns/op ({per*0.94:6.2f} cyc @940MHz)", flush=True)


def main():
    sel = set(sys.argv[1:])

    def want(n):
        return not sel or any(s in n for s in sel)

    if want("add"):
        run_case("add x+idx (i32->f32 cast+add)",
                 lambda x, i, k: x + ((i + k) & 63).astype(x.dtype))
    if want("fma"):
        run_case("fma x*c[k]+x",
                 lambda x, i, k: x * (1.0 + 1e-7 * k) + x)
    if want("select"):
        run_case("select(idx==k, x, 2x)",
                 lambda x, i, k: jnp.where(((i + k) & 7) == 3, x, x + x))
    if want("roll_lane"):
        run_case("roll lanes by k",
                 lambda x, i, k: pltpu.roll(x, k % 127 + 1, 1))
    if want("roll_sub"):
        run_case("roll sublanes by k",
                 lambda x, i, k: pltpu.roll(x, k % 7 + 1, 0))
    if want("lane_gather"):
        run_case("lane gather (8,128)",
                 lambda x, i, k: jnp.take_along_axis(x, (i + k) & 127,
                                                     axis=-1),
                 idx_max=128)
    if want("sub_gather"):
        run_case("sublane gather (8,128)",
                 lambda x, i, k: jnp.take_along_axis(x, (i + k) & 7, axis=0),
                 idx_max=8)
    if want("pair_gather"):
        def both(x, i, k):
            r = jnp.take_along_axis(x, (i + k) & 7, axis=0)
            return jnp.take_along_axis(r, (i + k) & 127, axis=-1)
        run_case("sub+lane gather pair (8,128)", both, idx_max=128)
    if want("bf16_lane"):
        run_case("lane gather bf16 (16,128) i16",
                 lambda x, i, k: jnp.take_along_axis(
                     x, (i + jnp.int16(k)) & jnp.int16(127), axis=-1),
                 dtype=jnp.bfloat16, idx_dtype=jnp.int16, sub=16,
                 idx_max=128)
    if want("bf16_sub"):
        run_case("sublane gather bf16 (16,128) i16",
                 lambda x, i, k: jnp.take_along_axis(
                     x, (i + jnp.int16(k)) & jnp.int16(15), axis=0),
                 dtype=jnp.bfloat16, idx_dtype=jnp.int16, sub=16,
                 idx_max=16)
    if want("gather_fma"):
        # the WELL stage-B core: gather pair + FMA with a value stream
        def gfma(x, i, k):
            r = jnp.take_along_axis(x, (i + k) & 7, axis=0)
            v = jnp.take_along_axis(r, (i + k) & 127, axis=-1)
            return v * x
        run_case("gather pair + mul", gfma, idx_max=128)

    # XLA-side: row-gather throughput for table pre-staging
    if want("xla_gather"):
        for rows, width, nv in ((2048, 128, 18752), (262144, 128, 18752),
                                (32768, 8, 2400000)):
            src = jnp.ones((rows, width), jnp.float32)
            ids = jnp.asarray(
                np.random.default_rng(0).integers(0, rows, nv), jnp.int32
            )

            def g_body(c, _):
                s, i = c
                out = jnp.take(s, i, axis=0)
                return (s, (i + out[:, :1].astype(jnp.int32).ravel() * 0)), None

            def gg(src, ids):
                (s, i), _ = jax.lax.scan(g_body, (src, ids), None, length=50)
                return i

            with jax.enable_x64(False):
                dt = timed(gg, src, ids) / 50
            gb = nv * width * 4 / dt / 1e9
            print(f"xla row-gather {rows}x{width} -> {nv} rows: "
                  f"{dt*1e6:8.1f}us  {gb:6.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
