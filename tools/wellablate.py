"""Ablation timing of the WELL kernel stages on the real matrix (dev
harness). Produces WRONG results for every case but 'full' — timing
attribution only.

Usage: python tools/wellablate.py [side] [reps]
"""
import functools
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

LANES = 128
TABLE_ROWS = 8
BLOCK = 8
BLOCKS_PER_VROW = 16


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def _taa_sub(t, i):
    return jnp.take_along_axis(t, i, axis=0)


def _taa_lane(t, i):
    return jnp.take_along_axis(t, i, axis=-1)


def make_kernel(win_rows, n_passes, merge_rounds, vregs, ablate):
    n_groups = (win_rows + 7) // 8
    if "groups" in ablate:
        n_groups = int(ablate.split("groups")[1] or 1)
    use_passes = n_passes if "pass" not in ablate else int(
        ablate.split("pass")[1] or 1)
    dbuf = "dbuf" in ablate
    vmem_x = "vmemx" in ablate

    def kernel(q_ref, gb_ref, amap_ref, lam_ref, pid_ref, rho_ref,
               data_ref, cont_ref, route_ref, x_ref, y_ref,
               table_s, gath_s, *extra):
        if vmem_x:
            t = pl.program_id(0)
            q8 = pl.multiple_of(q_ref[t], 8)

            def win_slice(g):
                return x_ref[pl.ds(q8 + g * 8, 8), :]

        elif dbuf:
            win_s, sem_s = extra[0], extra[1]
            t = pl.program_id(0)
            nt = pl.num_programs(0)

            def dma(slot, tt):
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(q_ref[tt], win_rows), :],
                    win_s.at[slot], sem_s.at[slot])

            @pl.when(t == 0)
            def _():
                dma(0, 0).start()

            @pl.when(t + 1 < nt)
            def _():
                dma((t + 1) % 2, t + 1).start()

            dma(t % 2, t).wait()

            def win_slice(g):
                return win_s[t % 2, g * 8: g * 8 + 8, :]
        else:
            def win_slice(g):
                return x_ref[0, g * 8: g * 8 + 8, :]

        if "streamonly" in ablate:
            # pure pipeline/stream cost: touch every input block once,
            # no converts/gathers/reduce
            acc = data_ref[0, 0:8, :]
            for f in range(1, vregs):
                acc = acc + data_ref[0, f * 8:f * 8 + 8, :]
            acc = acc + amap_ref[0, 0].astype(jnp.float32)
            acc = acc + lam_ref[0, 0:8, :].astype(jnp.float32)
            acc = acc + pid_ref[0, 0:8, :].astype(jnp.float32)
            acc = acc + rho_ref[0, 0, 0:8, :].astype(jnp.float32)
            acc = acc + cont_ref[0, 0, 0:8, :].astype(jnp.float32)
            acc = acc + route_ref[0, 0:8, :].astype(jnp.float32)
            y_ref[0, 0:8, :] = acc[:, :BLOCKS_PER_VROW]
            for f in range(1, vregs):
                y_ref[0, f * 8:f * 8 + 8, :] = acc[:, :BLOCKS_PER_VROW]
            return

        for f in range(vregs):
            if "noconv" in ablate:
                # skip all int8->int32 converts: fixed fake indices
                a32 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) & 63
            else:
                a32 = amap_ref[0, f].astype(jnp.int32)
            eta = a32 & 7
            grp = a32 >> 3
            # stage A
            if "noA" in ablate:
                table = win_slice(0)
            else:
                table_s[:] = jnp.zeros((8, 128), dtype=data_ref.dtype)
                for g in range(n_groups):
                    part = _taa_sub(win_slice(g), eta)
                    pltpu.store(table_s, part, mask=grp == g)
                table = table_s[:]
            r0 = f * 8
            if "noconv" in ablate:
                lam = a32 & 127
                pid = a32 & 3
            else:
                lam = lam_ref[0, r0:r0 + 8, :].astype(jnp.int32)
                pid = pid_ref[0, r0:r0 + 8, :].astype(jnp.int32)
            # stage B
            if "noB" in ablate:
                gathered = table
            else:
                gath_s[:] = jnp.zeros((8, 128), dtype=data_ref.dtype)
                for p in range(use_passes):
                    if "noconv" in ablate:
                        rho_p = (a32 + p) & 7
                    else:
                        rho_p = rho_ref[0, p, r0:r0 + 8, :].astype(jnp.int32)
                    rowsel = _taa_sub(table, rho_p)
                    val_p = _taa_lane(rowsel, lam)
                    pltpu.store(gath_s, val_p, mask=pid == p)
                gathered = gath_s[:]
            contrib = data_ref[0, r0:r0 + 8, :] * gathered
            # reduce
            if "nored" in ablate:
                y_ref[0, r0:r0 + 8, :] = contrib[:, :BLOCKS_PER_VROW]
                continue
            if "mxuC" in ablate:
                # constant block-sum matmul replaces the roll tree+compact
                lidx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                bidx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                C = ((lidx >> 3) == bidx).astype(contrib.dtype)
                cm = jnp.dot(contrib, C,
                             preferred_element_type=jnp.float32)
                for k in range(merge_rounds):
                    shift = 1 << k
                    shifted = pltpu.roll(cm, LANES - shift, 1)
                    mask = cont_ref[0, k, r0:r0 + 8, :] != 0
                    cm = cm + jnp.where(mask, shifted, 0.0)
                ridx = route_ref[0, r0:r0 + 8, :].astype(jnp.int32)
                yv = _taa_lane(cm, ridx)
                y_ref[0, r0:r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]
                continue
            if "mxuS2" in ablate:
                # weights modeled as a (128,128) f32 broadcast from an
                # existing slab without concat (timing only)
                selw = jnp.repeat(
                    rho_ref[0, 0, r0:r0 + 8, :].astype(jnp.float32),
                    16, axis=0)
                yv = jnp.dot(contrib, selw,
                             preferred_element_type=jnp.float32)
                y_ref[0, r0:r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]
                continue
            if "mxuS" in ablate:
                # per-vreg selection matmul does tree+merge+route in one
                # (timing only: reuse rho slab as a fake f32 Sel stream)
                sel = rho_ref[0, 0, r0:r0 + 8, :].astype(jnp.float32)
                sel128 = jnp.concatenate([sel] * 16, axis=0)  # (128,128)
                yv = jnp.dot(contrib, sel128,
                             preferred_element_type=jnp.float32)
                y_ref[0, r0:r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]
                continue
            red = contrib
            for shift in (1, 2, 4):
                red = red + pltpu.roll(red, LANES - shift, 1)
            cidx = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * BLOCK,
                LANES - BLOCK)
            cm = _taa_lane(red, cidx)
            if "nomerge" not in ablate:
                for k in range(merge_rounds):
                    shift = 1 << k
                    shifted = pltpu.roll(cm, LANES - shift, 1)
                    mask = cont_ref[0, k, r0:r0 + 8, :] != 0
                    cm = cm + jnp.where(mask, shifted, 0.0)
            if "noroute" in ablate:
                yv = cm
            else:
                if "noconv" in ablate:
                    ridx = a32 & 15
                else:
                    ridx = route_ref[0, r0:r0 + 8, :].astype(jnp.int32)
                yv = _taa_lane(cm, ridx)
            if "fullout" in ablate:
                y_ref[0, r0:r0 + 8, :] = yv
            else:
                y_ref[0, r0:r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]

    return kernel


def call_variant(well, x2d_rows, ablate):
    if "i32m" in ablate:
        import dataclasses as _dc

        well = _dc.replace(
            well,
            amap=well.amap.astype(jnp.int32),
            lam=well.lam.astype(jnp.int32),
            pid=well.pid.astype(jnp.int32),
            rho=well.rho.astype(jnp.int32),
            cont=well.cont.astype(jnp.int32),
            route=well.route.astype(jnp.int32),
        )
    win_rows = well.win_rows
    vregs = well.vregs_per_tile
    mrows = vregs * 8
    data = well.data
    n_tiles = data.shape[0]

    def block(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, q, gb: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    dbuf = "dbuf" in ablate
    vmem_x = "vmemx" in ablate
    scratch = [pltpu.VMEM((8, 128), data.dtype),
               pltpu.VMEM((8, 128), data.dtype)]
    if vmem_x:
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    elif dbuf:
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch += [pltpu.VMEM((2, win_rows, 128), data.dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    else:
        x_spec = block((win_rows, 128))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            block((vregs, 8, 128)),
            block((mrows, 128)),
            block((mrows, 128)),
            block((max(well.n_passes, 1), mrows, 128)),
            block((mrows, 128)),
            block((max(well.merge_rounds, 1), mrows, 128)),
            block((mrows, 128)),
            x_spec,
        ],
        out_specs=block((mrows, 128 if "fullout" in ablate
                         else BLOCKS_PER_VROW)),
        scratch_shapes=scratch,
    )
    if vmem_x:
        win_rows = win_rows + 8  # q rounded down to a sublane boundary
    kernel = make_kernel(win_rows, well.n_passes, well.merge_rounds,
                         vregs, ablate)

    @jax.jit
    def run(x2d):
        with jax.enable_x64(False):
            if vmem_x or dbuf:
                xw = x2d
            else:
                idx = well.q[:, None] + jnp.arange(
                    win_rows, dtype=jnp.int32)[None]
                xw = jnp.take(x2d, idx.reshape(-1), axis=0).reshape(
                    n_tiles, win_rows, LANES)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (n_tiles, mrows,
                     128 if "fullout" in ablate else BLOCKS_PER_VROW),
                    data.dtype),
                grid_spec=grid_spec,
            )(jnp.asarray((np.asarray(well.q) // 8) * 8, jnp.int32)
              if vmem_x else well.q,
              well.gb.reshape(-1), well.amap, well.lam, well.pid,
              well.rho, data, well.cont, well.route, xw)

    return run


def main():
    from bench import unstructured_fem_system
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.well import WELL

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import os
    ap = unstructured_fem_system(side)
    vpt = int(os.environ.get("VPT", "8"))
    well = WELL.from_csr(CSR.from_scipy(ap), dtype=jnp.float32,
                         vregs_per_tile=vpt)
    print(f"# {well}", flush=True)
    n2d = well.x2d_rows
    x = np.random.default_rng(0).normal(size=ap.shape[0])
    xp = jnp.asarray(np.pad(x, (0, n2d * LANES - len(x))), jnp.float32)
    x2d = xp.reshape(n2d, LANES)

    cases = sys.argv[3:] or [
        "full", "vmemx", "vmemx+mxuS", "vmemx+mxuC", "vmemx+nored",
        "vmemx+noB", "vmemx+noAnoBnored",
    ]
    for ab in cases:
        try:
            if ab == "xgather_only":
                idxs = well.q[:, None] + jnp.arange(
                    well.win_rows, dtype=jnp.int32)[None]

                @jax.jit
                def xg(x2d):
                    def body(c, _):
                        out = jnp.take(c, idxs.reshape(-1), axis=0)
                        return c + out.ravel()[0] * 0, None
                    c, _ = jax.lax.scan(body, x2d, None, length=reps)
                    return c
                with jax.enable_x64(False):
                    _sync(xg(x2d))
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        _sync(xg(x2d))
                        best = min(best, (time.perf_counter() - t0) / reps)
            else:
                run1 = call_variant(well, n2d, "" if ab == "full" else ab)

                @jax.jit
                def rep(x2d):
                    def body(c, _):
                        out = run1(c)
                        return c + out.ravel()[0] * 0, None
                    c, _ = jax.lax.scan(body, x2d, None, length=reps)
                    return c
                _sync(rep(x2d))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    _sync(rep(x2d))
                    best = min(best, (time.perf_counter() - t0) / reps)
            print(f"# {ab:14s} {best*1e6:8.1f}us  "
                  f"{ap.nnz/best/1e9:6.2f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"# {ab} FAILED: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
