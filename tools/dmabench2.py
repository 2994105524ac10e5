"""DMA bandwidth discriminators (dev harness): where do XLA's 550 GB/s
go when Pallas fetches the same bytes?

Cases:
  xla_sum    — XLA reduction over the array (read-BW baseline)
  vmem_whole — pallas, whole 8MB array as one unblocked VMEM input
  multi_src  — pallas, K separate HBM arrays DMA'd concurrently (manual)
  samebuf    — pallas, K concurrent DMAs from ONE array (queue test)
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


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def bench(fn, args, nbytes, name, reps=50):
    fn = jax.jit(fn)
    with jax.enable_x64(False):
        _sync(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:40s} {best*1e6:8.1f}us  {nbytes/best/1e9:6.1f} GB/s",
          flush=True)


def main(reps=50):
    MB = 1024 * 1024
    rows = 16 * MB // (128 * 4)  # 16 MB source
    x = jnp.ones((rows, 128), jnp.float32)

    # --- XLA baseline: full-array reduction chained -------------------
    def xla_sum(x):
        def body(c, _):
            return c + jnp.sum(x, axis=0), None
        c, _ = jax.lax.scan(body, jnp.zeros((128,), jnp.float32), None,
                            length=reps)
        return c
    bench(xla_sum, (x,), 16 * MB, "xla full-array sum (16MB)", reps)

    # --- pallas: whole array as unblocked VMEM input ------------------
    rows8 = 8 * MB // (128 * 4)
    x8 = jnp.ones((rows8, 128), jnp.float32)

    def k_whole(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[pl.ds(i * 512, 8), :]
        acc = jax.lax.fori_loop(0, rows8 // 512, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[:] = acc

    def vmem_whole(x8):
        def body(c, _):
            out = pl.pallas_call(
                k_whole,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x8)
            return c + out.ravel()[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c
    bench(vmem_whole, (x8,), 8 * MB, "pallas whole-VMEM input (8MB)", reps)

    # --- pallas: K concurrent manual DMAs, separate sources -----------
    K = 4
    chunk = 2048  # rows per DMA = 1MB
    nc = rows // chunk
    xs = [jnp.ones((rows, 128), jnp.float32) for _ in range(K)]

    def k_multi(*refs):
        srcs, o_ref, bufs, sems = refs[:K], refs[K], refs[K + 1], refs[K + 2]

        def body(i, acc):
            for k in range(K):
                pltpu.make_async_copy(
                    srcs[k].at[pl.ds(i * chunk, chunk), :],
                    bufs.at[k], sems.at[k],
                ).start()
            for k in range(K):
                pltpu.make_async_copy(
                    srcs[k].at[pl.ds(i * chunk, chunk), :],
                    bufs.at[k], sems.at[k],
                ).wait()
            return acc + bufs[0, 0:8, :]

        acc = jax.lax.fori_loop(0, nc, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[:] = acc

    def multi_src(*xs):
        def body(c, _):
            out = pl.pallas_call(
                k_multi,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * K,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, chunk, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((K,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(*xs)
            return c + out.ravel()[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c
    bench(multi_src, xs, K * 16 * MB, f"pallas {K} concurrent DMA streams",
          reps)

    # --- pallas: K concurrent DMAs from ONE source --------------------
    def k_same(x_ref, o_ref, bufs, sems):
        def body(i, acc):
            for k in range(K):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds((i * K + k) * chunk, chunk), :],
                    bufs.at[k], sems.at[k],
                ).start()
            for k in range(K):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds((i * K + k) * chunk, chunk), :],
                    bufs.at[k], sems.at[k],
                ).wait()
            return acc + bufs[0, 0:8, :]

        acc = jax.lax.fori_loop(0, nc // K, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[:] = acc

    def samebuf(x):
        def body(c, _):
            out = pl.pallas_call(
                k_same,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((K, chunk, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((K,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(x)
            return c + out.ravel()[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=reps)
        return c
    bench(samebuf, (x,), (nc // K) * K * chunk * 128 * 4,
          f"pallas {K} concurrent DMAs, one source", reps)


if __name__ == "__main__":
    main()
