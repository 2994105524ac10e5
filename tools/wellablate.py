"""Ablation timing of the WELL kernel stages on the real matrix (dev
harness). Produces WRONG results for every case but 'full' — timing
attribution only.  Matches the w1/w2 bit-packed layout (sparse/well.py).

Cases: full (production path), blockedx (pre-gathered windows instead
of VMEM-resident x), streamonly (pipeline+FMA only), noA / noB / nored
(skip a stage), passN / groupsN (cap gather passes / window groups).

Usage: python tools/wellablate.py [side] [reps] [case ...]
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


def make_kernel(win_rows, n_passes, merge_rounds, vregs, ablate,
                resident):
    n_groups = (win_rows + 7) // 8
    if "groups" in ablate:
        n_groups = int(ablate.split("groups")[1].split("+")[0] or 1)
    use_passes = n_passes
    if "pass" in ablate:
        use_passes = int(ablate.split("pass")[1].split("+")[0] or 1)

    def kernel(q_ref, gb_ref, data_ref, w1_ref, w2_ref, x_ref, y_ref,
               table_s, gath_s):
        t = pl.program_id(0)
        if resident:
            qt = pl.multiple_of(q_ref[t], 8)

            def win_slice(g):
                return x_ref[pl.ds(qt + g * 8, 8), :]
        else:
            def win_slice(g):
                return x_ref[0, g * 8:g * 8 + 8, :]

        if "streamonly" in ablate:
            acc = data_ref[0, 0:8, :]
            for f in range(1, vregs):
                acc = acc + data_ref[0, f * 8:f * 8 + 8, :]
            acc = acc + w1_ref[0, 0:8, :].astype(jnp.float32)
            acc = acc + w2_ref[0, 0:8, :].astype(jnp.float32)
            for f in range(vregs):
                y_ref[0, f * 8:f * 8 + 8, :] = acc[:, :BLOCKS_PER_VROW]
            return

        for f in range(vregs):
            r0 = f * 8
            w1 = w1_ref[0, r0:r0 + 8, :]
            w2 = w2_ref[0, r0:r0 + 8, :]
            a32 = (w2 >> 12) & 127
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
            lam = w1 & 127
            pid = (w1 >> 7) & 7
            # stage B
            if "noB" in ablate:
                gathered = table
            else:
                gath_s[:] = jnp.zeros((8, 128), dtype=data_ref.dtype)
                for p in range(use_passes):
                    rowsel = _taa_sub(table, (w2 >> (3 * p)) & 7)
                    val_p = _taa_lane(rowsel, lam)
                    pltpu.store(gath_s, val_p, mask=pid == p)
                gathered = gath_s[:]
            contrib = data_ref[0, r0:r0 + 8, :] * gathered
            # reduce
            if "nored" in ablate:
                y_ref[0, r0:r0 + 8, :] = contrib[:, :BLOCKS_PER_VROW]
                continue
            red = contrib
            for shift in (1, 2, 4):
                red = red + pltpu.roll(red, LANES - shift, 1)
            cidx = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * BLOCK,
                LANES - BLOCK)
            cm = _taa_lane(red, cidx)
            for k in range(merge_rounds):
                shift = 1 << k
                shifted = pltpu.roll(cm, LANES - shift, 1)
                cm = cm + jnp.where(((w1 >> (14 + k)) & 1) != 0,
                                    shifted, 0.0)
            yv = _taa_lane(cm, (w1 >> 10) & 15)
            y_ref[0, r0:r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]

    return kernel


def call_variant(well, ablate):
    resident = "blockedx" not in ablate
    win_rows = well.win_rows
    vregs = well.vregs_per_tile
    mrows = vregs * 8
    data = well.data
    n_tiles = data.shape[0]

    def block(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, q, gb: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    x_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if resident
              else block((win_rows, 128)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            block((mrows, 128)),
            block((mrows, 128)),
            block((mrows, 128)),
            x_spec,
        ],
        out_specs=block((mrows, BLOCKS_PER_VROW)),
        scratch_shapes=[pltpu.VMEM((8, 128), data.dtype),
                        pltpu.VMEM((8, 128), data.dtype)],
    )
    kernel = make_kernel(win_rows, well.n_passes, well.merge_rounds,
                         vregs, ablate, resident)

    @jax.jit
    def run(x2d):
        with jax.enable_x64(False):
            if resident:
                xw = x2d
            else:
                idx = well.q[:, None] + jnp.arange(
                    win_rows, dtype=jnp.int32)[None]
                xw = jnp.take(x2d, idx.reshape(-1), axis=0).reshape(
                    n_tiles, win_rows, LANES)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (n_tiles, mrows, BLOCKS_PER_VROW), data.dtype),
                grid_spec=grid_spec,
            )(well.q, well.gb.reshape(-1), well.data, well.w1, well.w2,
              xw)

    return run


def main():
    from bench import unstructured_fem_system
    from tpu_amg.sparse.csr import CSR
    from tpu_amg.sparse.well import WELL

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    import os
    ap = unstructured_fem_system(side)
    vpt = os.environ.get("VPT")
    well = WELL.from_csr(CSR.from_scipy(ap), dtype=jnp.float32,
                         vregs_per_tile=int(vpt) if vpt else None)
    print(f"# {well} vpt={well.vregs_per_tile}", flush=True)
    n2d = well.x2d_rows
    x = np.random.default_rng(0).normal(size=ap.shape[0])
    xp = jnp.asarray(np.pad(x, (0, n2d * LANES - len(x))), jnp.float32)
    x2d = xp.reshape(n2d, LANES)

    cases = sys.argv[3:] or [
        "full", "streamonly", "nored", "noB", "noAnoBnored", "blockedx",
    ]
    for ab in cases:
        try:
            run1 = call_variant(well, "" if ab == "full" else ab)

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
