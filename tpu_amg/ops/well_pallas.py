"""Pallas TPU kernel for WELL (windowed-ELL) SpMV — the unstructured
fast path.

The reference's only perf kernel (par_spmm.rs:98-132) handles arbitrary
CSR at memory speed on CPU; on TPU an arbitrary ``x[cols]`` gather lowers
to a scalar XLA gather (~0.1 Gnnz/s measured round 1).  This kernel keeps
the gather on-chip: Mosaic's only fast gathers are

  * lane gather   : ``take_along_axis(t, i, axis=-1)`` with t, i of shape
                    (M, 128) — each sublane row gathers within its own
                    128 lanes, and
  * sublane gather: the same with ``axis=0`` and shape exactly (8, 128) —
                    each lane gathers within its own 8 sublanes,

so the WELL format (built host-side, `tpu_amg/sparse/well.py`) stages the
SpMV as, per 1024-slot vreg of matrix entries:

  1. window  : one async DMA copies x rows ``[q_t, q_t + WIN)`` of the
               (n/128, 128)-reshaped x into VMEM — the only HBM access
               to x (tile windows exist because the matrix is RCM-banded).
  2. stage A : build a per-vreg dedup table (8, 128) holding every
               distinct x value the vreg's rows touch: WIN/8 masked
               sublane gathers from the window (a value's table lane is
               forced to ``col % 128`` because sublane gathers preserve
               lanes).
  3. stage B : per entry slot, a sublane gather (table row, per pass) +
               one lane gather (table lane) reconstructs x[col]; slots
               whose (vreg-row, lane) collide are split across P passes.
  4. reduce  : FMA with the entry values, a shift-add tree sums each
               8-lane block, blocks of multi-block rows are merged with
               host-computed masks, and a final lane route drops each row
               sum into its output slot.

Everything dynamic is data; every index map is a static int8 array
streamed with the values, so the whole kernel is gathers + FMAs at VPU
speed with no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128
TABLE_ROWS = 8
BLOCK = 8  # lanes per row-block
BLOCKS_PER_VROW = LANES // BLOCK  # 16


def _taa_sub(table, idx):
    """Sublane gather: out[m, l] = table[idx[m, l], l]; (8,128) only."""
    return jnp.take_along_axis(table, idx, axis=0)


def _taa_lane(table, idx):
    """Lane gather: out[m, l] = table[m, idx[m, l]]."""
    return jnp.take_along_axis(table, idx, axis=-1)


def _kernel(
    # scalar prefetch
    q_ref,
    gb_ref,
    # blocked inputs (leading tile axis of size 1); w1/w2 are the
    # bit-packed index words (see sparse/well.py docstring)
    data_ref,
    w1_ref,
    w2_ref,
    # x window: unblocked HBM x2d (dma mode), whole VMEM-resident x2d
    # (resident mode), or blocked pre-gathered windows
    x_ref,
    # output
    y_ref,
    # scratch: [win_ref, sem_ref (dma mode)], table_s, gath_s
    *scratch,
    win_rows: int,
    n_passes: int,
    merge_rounds: int,
    vregs: int,
    x_mode: str,
    mode: int = 2,
):
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    if x_mode == "dma":
        win_ref, sem_ref, table_s, gath_s = scratch
        qt = q_ref[t]
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(qt, win_rows), :], win_ref, sem_ref
        )
        dma.start()
        dma.wait()

        def win_slice(g):
            return win_ref[g * 8 : g * 8 + 8, :]

    elif x_mode == "resident":
        # x2d lives whole in VMEM; window starts are 8-aligned by
        # construction (sparse/well.py), so each group slice is a
        # sublane-aligned dynamic slice — no staging copy at all
        table_s, gath_s = scratch
        qt = pl.multiple_of(q_ref[t], 8)

        def win_slice(g):
            return x_ref[pl.ds(qt + g * 8, 8), :]

    else:
        table_s, gath_s = scratch

        def win_slice(g):
            return x_ref[0, g * 8 : g * 8 + 8, :]

    for f in range(vregs):
        # per-vreg dynamic bounds: the grid loop runs on the scalar core,
        # so pl.when-skipped groups/passes cost ~nothing (sparse/well.py)
        base = (t * vregs + f) * 3  # gb is flattened 1-D for SMEM packing
        glo = gb_ref[base]
        ghi = gb_ref[base + 1]
        phi = gb_ref[base + 2]

        r0 = f * TABLE_ROWS
        w1 = w1_ref[0, r0 : r0 + 8, :]
        w2 = w2_ref[0, r0 : r0 + 8, :]

        # ---- stage A: dedup table --------------------------------------
        cdt = x_ref.dtype  # compute dtype (data may be a bf16 stream)
        a32 = (w2 >> 12) & 127  # (8, 128) window row per table slot
        eta = a32 & 7
        grp = a32 >> 3
        n_groups = (win_rows + 7) // 8
        if mode == 0:
            table = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
            for g in range(n_groups):
                part = _taa_sub(win_slice(g), eta)
                table = jnp.where(grp == g, part, table)
        else:
            table_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
            for g in range(n_groups):

                def fill(g=g):
                    part = _taa_sub(win_slice(g), eta)
                    pltpu.store(table_s, part, mask=grp == g)

                if mode == 2:
                    pl.when((glo <= g) & (g <= ghi))(fill)
                else:
                    fill()
            table = table_s[:]

        # ---- stage B: per-slot gather ----------------------------------
        lam = w1 & 127
        pid = (w1 >> 7) & 7

        if mode == 0:
            gathered = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
            for p in range(n_passes):
                rowsel = _taa_sub(table, (w2 >> (3 * p)) & 7)
                val_p = _taa_lane(rowsel, lam)
                gathered = jnp.where(pid == p, val_p, gathered)
        else:
            gath_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
            for p in range(n_passes):

                def gather(p=p):
                    rowsel = _taa_sub(table, (w2 >> (3 * p)) & 7)
                    val_p = _taa_lane(rowsel, lam)
                    pltpu.store(gath_s, val_p, mask=pid == p)

                if mode == 2:
                    pl.when(p < phi)(gather)
                else:
                    gather()
            gathered = gath_s[:]

        contrib = data_ref[0, r0 : r0 + 8, :].astype(cdt) * gathered

        # ---- reduce: 8-lane block sums at lanes 0, 8, ..., 120 ----------
        red = contrib
        for shift in (1, 2, 4):
            red = red + pltpu.roll(red, LANES - shift, 1)
        # compact block sums into lanes [0, 16)
        cidx = jnp.minimum(
            jax.lax.broadcasted_iota(jnp.int32, (TABLE_ROWS, LANES), 1)
            * BLOCK,
            LANES - BLOCK,
        )
        cm = _taa_lane(red, cidx)
        # merge multi-block rows (row sum lands at its first block)
        for k in range(merge_rounds):
            shift = 1 << k
            shifted = pltpu.roll(cm, LANES - shift, 1)
            mask = (w1 >> (14 + k)) & 1
            cm = cm + jnp.where(mask != 0, shifted, 0.0)
        # route block sums to output row slots
        yv = _taa_lane(cm, (w1 >> 10) & 15)
        y_ref[0, r0 : r0 + 8, :] = yv[:, :BLOCKS_PER_VROW]


@functools.partial(
    jax.jit,
    static_argnames=(
        "win_rows",
        "n_passes",
        "merge_rounds",
        "vregs",
        "x_mode",
        "interpret",
        "mode",
    ),
)
def _well_spmv_call(
    q,
    gb,
    data,
    w1,
    w2,
    x2d,
    *,
    win_rows: int,
    n_passes: int,
    merge_rounds: int,
    vregs: int,
    x_mode: str = "blocked",
    interpret: bool = False,
    mode: int = 2,
):
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = data.shape[0]
    mrows = vregs * TABLE_ROWS

    def block(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda t, q_ref, gb_ref: (t,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    cdt = x2d.dtype  # compute dtype (data may be a bf16 stream)
    vreg_scratch = [
        pltpu.VMEM((TABLE_ROWS, LANES), cdt),  # table_s
        pltpu.VMEM((TABLE_ROWS, LANES), cdt),  # gath_s
    ]
    if x_mode == "dma":
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # x2d stays in HBM
        scratch = [
            pltpu.VMEM((win_rows, LANES), cdt),
            pltpu.SemaphoreType.DMA,
        ] + vreg_scratch
        x_arg = x2d
    elif x_mode == "resident":
        # whole x2d pinned in VMEM for the kernel's lifetime: windows
        # are sliced in place (8-aligned q by construction) — no HBM
        # re-reads, no staging, the big win for banded matrices whose
        # windows overlap heavily between tiles
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = list(vreg_scratch)
        x_arg = x2d
    else:
        # pre-gathered per-tile windows: an efficient XLA row gather
        # (512B rows), auto-double-buffered by the pallas pipeline
        with jax.enable_x64(False):
            idx = q[:, None] + jnp.arange(win_rows, dtype=jnp.int32)[None]
            x_arg = jnp.take(x2d, idx.reshape(-1), axis=0).reshape(
                n_tiles, win_rows, LANES
            )
        x_spec = block((win_rows, LANES))
        scratch = list(vreg_scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            block((mrows, LANES)),  # data
            block((mrows, LANES)),  # w1
            block((mrows, LANES)),  # w2
            x_spec,
        ],
        out_specs=block((mrows, BLOCKS_PER_VROW)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel,
        win_rows=win_rows,
        n_passes=n_passes,
        merge_rounds=merge_rounds,
        vregs=vregs,
        x_mode=x_mode,
        mode=mode,
    )
    nnz_slots = data.size
    # The package enables jax x64 globally (f64 host numerics); Mosaic
    # supports no 64-bit types and both the kernel body (take_along_axis
    # mints int64 iotas) and the BlockSpec index maps (python-int block
    # indices canonicalize to i64) must be traced with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles, mrows, BLOCKS_PER_VROW), cdt
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz_slots,
                bytes_accessed=(
                    data.size * data.dtype.itemsize
                    + 4 * w1.size + 4 * w2.size
                    + n_tiles * win_rows * LANES * data.dtype.itemsize
                ),
                transcendentals=0,
            ),
        )(q, gb.reshape(-1), data, w1, w2, x_arg)
    return out


def well_spmv(well, x: jax.Array, interpret=None, x_mode=None,
              mode=None):
    """y = A @ x for a WELL-formatted matrix (see sparse/well.py)."""
    import os

    # Kernel variant (hardware A/B, 262k Delaunay, TPU v5e): mode 0
    # (select chains) 403 us, mode 1 (masked scratch stores) 399 us,
    # mode 2 (pl.when dynamic bounds) 1764 us — the scalar-core branches
    # pl.when emits cost far more than the masked work they skip, so the
    # dynamic-bounds variant loses 4.4x and mode 1 is the default.
    # TPU_AMG_WELL_MODE overrides for A/B runs only.
    if mode is None:
        mode = int(os.environ.get("TPU_AMG_WELL_MODE", "1"))
    n2d = well.x2d_rows
    # compute dtype: f32 unless the caller feeds bf16 x; a bf16 DATA
    # stream (WELL.astype_values) still computes/gathers in f32
    cdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.pad(x.astype(cdt), (0, n2d * LANES - x.shape[0]))
    x2d = xp.reshape(n2d, LANES)
    if x_mode is None:
        # keep x2d whole in VMEM when it fits alongside the slab
        # pipeline (ablation: kills the 143us/262k XLA window
        # pre-gather AND runs the kernel 12% faster); cap overridable
        # for A/B runs
        cap_mb = float(os.environ.get("TPU_AMG_WELL_RESIDENT_MB", "8"))
        x_bytes = n2d * LANES * jnp.dtype(cdt).itemsize
        x_mode = "resident" if x_bytes <= cap_mb * 1e6 else "blocked"

    def call(interp, *args):
        return _well_spmv_call(
            *args,
            win_rows=well.win_rows,
            n_passes=well.n_passes,
            merge_rounds=well.merge_rounds,
            vregs=well.vregs_per_tile,
            x_mode=str(x_mode),
            interpret=interp,
            mode=int(mode),
        )

    operands = (
        well.q, well.gb, well.data, well.w1, well.w2, x2d,
    )
    if interpret is None:
        # decide per lowering platform, not per global device list: a
        # host-pinned setup (SolverConfig.setup_on_host) traces this for
        # cpu while the session's default device is a TPU
        from functools import partial

        out = jax.lax.platform_dependent(
            *operands,
            cpu=partial(call, True),
            default=partial(call, False),
        )
    else:
        out = call(bool(interpret), *operands)
    # (T, vregs*8, 16) → row-major rows; each vreg-row's first
    # rows_per_vrow lanes are real rows
    g = well.rows_per_vrow
    y = out.reshape(-1, BLOCKS_PER_VROW)[:, :g].reshape(-1)[: well.shape[0]]
    if well.extra_rows.size:
        contrib = well.extra_vals * x[well.extra_cols]
        y = y.at[well.extra_rows].add(contrib.astype(y.dtype))
    return y
