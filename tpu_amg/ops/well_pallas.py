"""Pallas TPU kernel for WELL (windowed-ELL) SpMV — the unstructured
fast path.

The reference's only perf kernel (par_spmm.rs:98-132) handles arbitrary
CSR at memory speed on CPU; on TPU an arbitrary ``x[cols]`` gather lowers
to a scalar XLA gather (~0.1 Gnnz/s measured round 1).  This kernel keeps
the gather on-chip.  Mosaic's only fast gathers are

  * lane gather   : ``take_along_axis(t, i, axis=-1)`` with t, i of shape
                    (M, 128) — each sublane row gathers within its own
                    128 lanes, and
  * sublane gather: the same with ``axis=0`` and shape exactly (8, 128) —
                    each lane gathers within its own 8 sublanes,

so the WELL format (built host-side, `tpu_amg/sparse/well.py`) stages
the SpMV per 1024-slot vreg of matrix entries:

  1. stage A : build a per-vreg dedup table (8, 128) holding every
               distinct x value the vreg's rows touch — masked sublane
               gathers from the vreg's own window rows
               [qv, qv + 8·n_groups) of the (n/128, 128)-reshaped x
               (a value's table lane is forced to ``col % 128``).
  2. stage B : per entry slot, a sublane gather (table row, per pass) +
               one lane gather (table lane) reconstructs x[col]; slots
               whose (vreg-row, table lane) collide split across ≤4
               passes.
  3. contrib : FMA with the entry values, buffered to a tile-wide VMEM
               scratch.
  4. reduce  : ONE per tile — block sums via an MXU matmul with a
               static 0/1 selection matrix (Precision.HIGHEST; the
               default TPU matmul rounds inputs to bf16 and costs
               2.7e-3 relerr), then (M, B)-wide merge/route gathers
               driven by the narrow ``rts`` sidecar.  The v1 per-vreg
               (8, 16) reduce chains measured 224 us of the 542 us total
               at 1M — tile batching cut that to ~127 us (see
               sparse/well.py module docstring for the full A/B table).

Everything dynamic is data; all index maps stream as one packed int32
word per slot, so the kernel is gathers + FMAs at VPU speed with no
data-dependent control flow (per-vreg/per-tile pl.when branches were
measured SLOWER than the masked work they skip — rejected variants of
record in sparse/well.py).

x modes:
  * resident — the whole (x2d_rows, 128) x lives in VMEM for the
    kernel's lifetime; per-vreg windows are sliced in place (8-aligned
    qv by construction).  Default whenever x fits the cap
    (TPU_AMG_WELL_RESIDENT_MB, 8 MB ≈ 16M dofs f32 per shard).
  * blocked — per-tile windows pre-gathered by XLA (512 B rows) and
    pipelined as a normal blocked input; vreg windows are sliced
    relative to the tile base.  Fallback for huge x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128
TABLE_ROWS = 8


def _taa_sub(table, idx):
    """Sublane gather: out[m, l] = table[idx[m, l], l]; (8,128) only."""
    return jnp.take_along_axis(table, idx, axis=0)


def _taa_lane(table, idx):
    """Lane gather: out[m, l] = table[m, idx[m, l]]."""
    return jnp.take_along_axis(table, idx, axis=-1)


def _kernel(
    # scalar prefetch
    q_ref,
    qv_ref,
    ngv_ref,
    exq_ref,
    # blocked inputs (leading tile axis of size 1); ex_* present only
    # when n_ex_groups > 0
    *refs,
    n_groups: int,
    n_passes: int,
    merge_rounds: int,
    vregs: int,
    bpv: int,
    x_mode: str,
    idroute: bool = False,
    n_ex_groups: int = 0,
    blk: int = 8,
    sel_g: int = 0,
    sel_p4: int = 0,
    sel_p2: int = 0,
    compact: bool = False,
    g_rows: int = 0,
    sparse_groups: bool = False,
):
    from jax.experimental.pallas import tpu as pltpu

    if n_ex_groups:
        (data_ref, w_ref, rts_ref, gmap_ref, ex_tw_ref, x_ref, y_ref,
         cbuf, table_s, gath_s, ext_s) = refs
    else:
        (data_ref, w_ref, rts_ref, gmap_ref, x_ref, y_ref, cbuf,
         table_s, gath_s) = refs
    ngs = gmap_ref.shape[2] // vregs
    t = pl.program_id(0)
    cdt = x_ref.dtype  # compute dtype (data may be a bf16 stream)
    mrows = vregs * TABLE_ROWS
    if n_ex_groups:
        # ---- per-tile extras table (see sparse/well.py extras
        # section): stage-A-style masked sublane gathers from the
        # tile's extras window.  Spilled entries kept their slot with
        # pass id 3 and read this table through the normal stage-B
        # two-step gather (sigma in word bits 18-20 at table positions)
        extw = ex_tw_ref[0]
        eta_x = extw & 7
        grp_x = (extw >> 3) & 31
        eq = pl.multiple_of(exq_ref[t], 8)
        ext_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
        for gi in range(n_ex_groups):
            if x_mode == "resident":
                winx = x_ref[pl.ds(eq + gi * 8, 8), :]
            else:
                winx = x_ref[0, pl.ds(eq - q_ref[t] + gi * 8, 8), :]
            part = _taa_sub(winx, eta_x)
            pltpu.store(ext_s, part, mask=grp_x == gi)
        ex_table = ext_s[:]
    for f in range(vregs):
        r0 = f * TABLE_ROWS
        w = w_ref[0, r0 : r0 + 8, :]
        amap = (w >> 21) & 1023
        eta = amap & 7
        grp = amap >> 3
        if sparse_groups:
            # per-vreg USED-group list (SMEM-blocked): stage A gathers
            # only the 8-row x2d groups this vreg touches — no
            # contiguous-span cap, no empty-group sweeps (round 5)
            def win_slice(gi, f=f):
                ag = gmap_ref[0, 0, f * ngs + gi]
                return x_ref[pl.ds(pl.multiple_of(ag * 8, 8), 8), :]

        elif x_mode == "resident":
            qv = pl.multiple_of(qv_ref[t * vregs + f], 8)

            def win_slice(gi, qv=qv):
                return x_ref[pl.ds(qv + gi * 8, 8), :]

        else:  # blocked: window rows relative to the tile base q[t]
            qv = pl.multiple_of(qv_ref[t * vregs + f] - q_ref[t], 8)

            def win_slice(gi, qv=qv):
                return x_ref[0, pl.ds(qv + gi * 8, 8), :]

        # ---- stage A: dedup table (masked sublane gathers) -----------
        # static unrolled loop over the GLOBAL group count; the format
        # build soft-caps max(ng) near the typical span so no boundary
        # outlier sets every vreg's stage-A program length
        # (sparse/well.py).  Rejected on hardware (round 5): a dynamic
        # per-vreg lax.fori_loop trip count (scalar-prefetched ngv)
        # cost ~20+ cycles/iteration of loop overhead — the 1M 3-D
        # fine SpMV went 3.6 -> 10.4 ms even with 12% fewer slots.
        table_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
        for gi in range(n_groups):
            part = _taa_sub(win_slice(gi), eta)
            pltpu.store(table_s, part, mask=grp == gi)
        table = table_s[:]

        # ---- stage B: per-slot gather ---------------------------------
        lam = w & 127
        pid = (w >> 7) & 3
        gath_s[:] = jnp.zeros((TABLE_ROWS, LANES), dtype=cdt)
        for p in range(n_passes):
            rowsel = _taa_sub(table, (w >> (9 + 3 * p)) & 7)
            val = _taa_lane(rowsel, lam)
            pltpu.store(gath_s, val, mask=pid == p)
        if n_ex_groups:
            rowsel = _taa_sub(ex_table, (w >> 18) & 7)
            val = _taa_lane(rowsel, lam)
            pltpu.store(gath_s, val, mask=pid == 3)

        cbuf[r0 : r0 + 8, :] = (
            data_ref[0, r0 : r0 + 8, :].astype(cdt) * gath_s[:]
        )

    # ---- tile-batched reduce ------------------------------------------
    # static piecewise column-of-lane: sel_g primary blocks of ``blk``
    # lanes, then full / half / quarter tail units (legacy layouts
    # pass sel_g = bpv so the first branch covers every lane)
    half = max(blk // 2, 1)
    quart = max(blk // 4, 1)
    # compact mode widens the reduce output to a full 128 lanes (same
    # MXU tile count) so the row-major compaction below can gather from
    # (8, 128)-shaped cm slices
    cmw = LANES if compact else bpv
    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, cmw), 0)
    full_end = (sel_g + sel_p4) * blk
    half_end = full_end + sel_p2 * half
    col = jnp.where(
        li < sel_g * blk,
        li // blk,
        jnp.where(
            li < full_end,
            sel_g + (li - sel_g * blk) // blk,
            jnp.where(
                li < half_end,
                sel_g + sel_p4 + (li - full_end) // half,
                sel_g + sel_p4 + sel_p2 + (li - half_end) // quart,
            ),
        ),
    )
    mblk = (
        col == jax.lax.broadcasted_iota(jnp.int32, (LANES, cmw), 1)
    ).astype(cdt)
    cm = jnp.dot(
        cbuf[:], mblk, preferred_element_type=cdt,
        precision=jax.lax.Precision.HIGHEST,
    )
    rts = rts_ref[0]
    if idroute:
        # identity-route: primary block sits AT the row's lane; fold in
        # the flagged overflow blocks (6 rts bits per round), no route
        # gather.  Overflow lanes are never merge targets, so rounds
        # read from untouched tail lanes regardless of order.
        if compact and rts.shape[1] < cmw:
            rts = jnp.pad(rts, ((0, 0), (0, cmw - rts.shape[1])))
        for k in range(merge_rounds):
            fld = rts >> (7 * k)
            ov = _taa_lane(cm, fld & 63)
            cm = cm + jnp.where(
                (fld >> 6) & 1 != 0, ov, jnp.zeros_like(cm)
            )
        if compact:
            # ---- in-kernel row-major compaction -----------------------
            # cm holds row r = m*g + j at (m, j).  Key identity: after a
            # per-row lane ROTATION rot[m, l] = cm[m, (l - m*g) mod 128],
            # the value for output position p = m*g + j sits at exactly
            # (row p//g, lane p%128) — p - g*(p//g) = p%g < g, so the
            # rotated read is always a real primary column.  One lane
            # gather performs every row's rotation at once; the row-major
            # (out_rows, 128) chunks then need only masked SUBLANE
            # gathers (the lane is already correct), replacing the
            # measured ~70 us XLA slice+relayout of the padded block
            # layout (plus its 128-lane-padded HBM round trip).
            li_f = jax.lax.broadcasted_iota(jnp.int32, (mrows, LANES), 1)
            mi_f = jax.lax.broadcasted_iota(jnp.int32, (mrows, LANES), 0)
            rot = _taa_lane(cm, (li_f - mi_f * g_rows) & (LANES - 1))
            out_rows = mrows * g_rows // LANES
            # the per-slot row map m = s//g is a compile-time function
            # built from iotas (kernels cannot capture array constants);
            # s < 8192 and g <= 32 are exact in f32, and the +0.5 keeps
            # the floor clear of rounding boundaries
            si8 = (
                jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            )
            for c in range(out_rows // 8):
                lo_s = c * 8 * LANES
                m0 = (lo_s // g_rows) & ~7
                ngr = ((lo_s + 8 * LANES - 1) // g_rows - m0) // 8 + 1
                mi = jnp.floor(
                    ((si8 + lo_s).astype(jnp.float32) + 0.5)
                    * (1.0 / g_rows)
                ).astype(jnp.int32)
                acc = jnp.zeros((8, LANES), dtype=cdt)
                for gi2 in range(ngr):
                    lo = m0 + 8 * gi2
                    sub = rot[lo : lo + 8, :]
                    val = _taa_sub(sub, jnp.clip(mi - lo, 0, 7))
                    acc = jnp.where(
                        (mi >= lo) & (mi < lo + 8), val, acc
                    )
                y_ref[0, c * 8 : (c + 1) * 8, :] = acc
        else:
            y_ref[0] = cm
    else:
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (mrows, bpv), 1)
        for k in range(merge_rounds):
            idx = jnp.minimum(iota_b + (1 << k), bpv - 1)
            shifted = _taa_lane(cm, idx)
            mask = (rts >> (5 + k)) & 1
            cm = cm + jnp.where(mask != 0, shifted, jnp.zeros_like(cm))
        y_ref[0] = _taa_lane(cm, rts & 31)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_groups",
        "n_passes",
        "merge_rounds",
        "vregs",
        "bpv",
        "win_rows",
        "x_mode",
        "idroute",
        "n_ex_groups",
        "blk",
        "sel_g",
        "sel_p4",
        "sel_p2",
        "compact",
        "g_rows",
        "sparse_groups",
        "interpret",
    ),
)
def _well_spmv_call(
    q,
    qv,
    ngv,
    exq,
    data,
    w,
    rts,
    gmap,
    ex_tw,
    x2d,
    *,
    n_groups: int,
    n_passes: int,
    merge_rounds: int,
    vregs: int,
    bpv: int,
    win_rows: int,
    x_mode: str = "resident",
    idroute: bool = False,
    n_ex_groups: int = 0,
    blk: int = 8,
    sel_g: int = 0,
    sel_p4: int = 0,
    sel_p2: int = 0,
    compact: bool = False,
    g_rows: int = 0,
    sparse_groups: bool = False,
    interpret: bool = False,
):
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = data.shape[0]
    mrows = vregs * TABLE_ROWS
    out_rows = mrows * g_rows // LANES if compact else 0

    def block(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda t, q_ref, qv_ref, ngv_ref, exq_ref: (t,)
            + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    cdt = x2d.dtype  # compute dtype (data may be a bf16 stream)
    if x_mode == "resident":
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        x_arg = x2d
    else:
        # pre-gathered per-tile windows: an efficient XLA row gather
        # (512B rows), auto-double-buffered by the pallas pipeline
        with jax.enable_x64(False):
            idx = q[:, None] + jnp.arange(win_rows, dtype=jnp.int32)[None]
            idx = jnp.minimum(idx, x2d.shape[0] - 1)
            x_arg = jnp.take(x2d, idx.reshape(-1), axis=0).reshape(
                n_tiles, win_rows, LANES
            )
        x_spec = block((win_rows, LANES))

    ex_specs = (
        [block((TABLE_ROWS, LANES))] if n_ex_groups else []  # ex_tw
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            block((mrows, LANES)),  # data
            block((mrows, LANES)),  # w
            block((mrows, bpv)),  # rts
            # per-tile sparse-group lists: scalar-read per (vreg, gi).
            # (T, 1, F*ngs) so the last two block dims equal the array
            # dims — the Mosaic block-shape divisibility rule
            pl.BlockSpec(
                (1, 1, gmap.shape[2]),
                lambda t, q_ref, qv_ref, ngv_ref, exq_ref: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        + ex_specs
        + [x_spec],
        out_specs=block(
            (out_rows, LANES) if compact else (mrows, bpv)
        ),
        scratch_shapes=[
            pltpu.VMEM((mrows, LANES), cdt),  # cbuf
            pltpu.VMEM((TABLE_ROWS, LANES), cdt),  # table_s
            pltpu.VMEM((TABLE_ROWS, LANES), cdt),  # gath_s
        ]
        + (
            [pltpu.VMEM((TABLE_ROWS, LANES), cdt)]  # ext_s
            if n_ex_groups
            else []
        ),
    )
    kernel = functools.partial(
        _kernel,
        n_groups=n_groups,
        n_passes=n_passes,
        merge_rounds=merge_rounds,
        vregs=vregs,
        bpv=bpv,
        x_mode=x_mode,
        idroute=idroute,
        n_ex_groups=n_ex_groups,
        blk=blk,
        sel_g=sel_g,
        sel_p4=sel_p4,
        sel_p2=sel_p2,
        compact=compact,
        g_rows=g_rows,
        sparse_groups=sparse_groups,
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
                (n_tiles, out_rows, LANES) if compact
                else (n_tiles, mrows, bpv),
                cdt,
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz_slots,
                bytes_accessed=(
                    data.size * data.dtype.itemsize
                    + 4 * w.size
                    + 4 * rts.size
                ),
                transcendentals=0,
            ),
        )(
            q, qv, ngv, exq, data, w, rts, gmap,
            *((ex_tw,) if n_ex_groups else ()),
            x_arg,
        )
    return out



def _stray_kernel(exm_ref, exj_ref, excr_ref, excl_ref, vals_ref,
                  out_in_ref, x_ref, out_ref, *, n_stray: int):
    """Patch ``n_stray`` spilled entries into the reduce output IN
    PLACE (out aliased): per entry, read the x row, lane-select x[col],
    FMA into the row's primary column.  ~10 VPU ops per stray — the
    XLA gather/scatter pair costs a fixed ~170 us regardless of count,
    so even a handful of strays must stay on-chip."""
    out_ref[...] = out_in_ref[...]
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ncols = out_ref.shape[1]
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1)
    for i in range(n_stray):
        cr = excr_ref[i]
        xrow = x_ref[pl.ds(cr, 1), :]
        xv = jnp.sum(
            jnp.where(excl_ref[i] == lane_i, xrow,
                      jnp.zeros((), xrow.dtype))
        )
        m = exm_ref[i]
        yrow = out_ref[pl.ds(m, 1), :]
        out_ref[pl.ds(m, 1), :] = yrow + jnp.where(
            exj_ref[i] == col_i,
            vals_ref[0, i] * xv,
            jnp.zeros((), yrow.dtype),
        )


@functools.partial(jax.jit, static_argnames=("n_stray", "interpret"))
def _stray_patch_call(exm, exj, excr, excl, vals, out2d, x2d, *,
                      n_stray: int, interpret: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_stray_kernel, n_stray=n_stray),
            out_shape=jax.ShapeDtypeStruct(out2d.shape, out2d.dtype),
            interpret=interpret,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # vals
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # out (in)
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )(exm, exj, excr, excl, vals, out2d, x2d)


def well_spmv(well, x: jax.Array, interpret=None, x_mode=None):
    """y = A @ x for a WELL-formatted matrix (see sparse/well.py)."""
    import os

    n2d = well.x2d_rows
    # compute dtype: f32 unless the caller feeds bf16 x; a bf16 DATA
    # stream (WELL.astype_values) still computes/gathers in f32
    cdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.pad(x.astype(cdt), (0, n2d * LANES - x.shape[0]))
    x2d = xp.reshape(n2d, LANES)
    if getattr(well, "sparse_groups", False):
        # sparse-group starts index the whole x2d — resident only
        x_mode = "resident"
    if x_mode is None:
        # keep x2d whole in VMEM when it fits alongside the slab
        # pipeline (kills the XLA window pre-gather AND runs the kernel
        # faster); cap overridable for A/B runs
        cap_mb = float(os.environ.get("TPU_AMG_WELL_RESIDENT_MB", "8"))
        x_bytes = n2d * LANES * jnp.dtype(cdt).itemsize
        x_mode = "resident" if x_bytes <= cap_mb * 1e6 else "blocked"

    if well.idroute and well.bcols:
        sel_g = well.rows_per_vrow
        if well.up4 >= 0:
            sel_p4, sel_p2 = well.up4, well.up2
        else:
            # pre-round-5 layouts: the split is a pure function of
            # (tail, block, g)
            from tpu_amg.sparse.well import _unit_split_capped

            sel_p4, sel_p2, _ = _unit_split_capped(
                LANES - well.block * sel_g, well.block, sel_g
            )
    else:
        sel_g, sel_p4, sel_p2 = well.blocks_per_vrow, 0, 0

    # stray spills ride a tiny patch kernel over the reduce output
    # (idroute only: strays there are a few hundred grant/sigma
    # leftovers; the XLA gather/scatter fallback costs a fixed ~170 us)
    stray = None
    if (
        well.idroute
        and 0 < int(well.extra_cols.shape[0]) <= 4096
        and not isinstance(well.extra_rows, jax.core.Tracer)
    ):
        er = np.asarray(well.extra_rows)[np.asarray(well.extra_seg)]
        ec = np.asarray(well.extra_cols)
        ev = np.asarray(well.extra_vals)
        # patch position of row r in the 2-D out view: row-major
        # (n2d_out, 128) chunks under compact, (vreg-row, lane) blocks
        # otherwise
        gg = LANES if well.compact else well.rows_per_vrow
        kpad = -(-len(ec) // LANES) * LANES
        stray = (
            jnp.asarray(er // gg, jnp.int32),
            jnp.asarray(er % gg, jnp.int32),
            jnp.asarray((ec // LANES).astype(np.int32)),
            jnp.asarray((ec % LANES).astype(np.int32)),
            jnp.asarray(
                np.pad(ev.astype(np.float64), (0, kpad - len(ec)))
            ).astype(cdt).reshape(1, kpad),
            len(ec),
        )

    def call(interp, *args):
        out = _well_spmv_call(
            *args,
            n_groups=well.n_groups,
            n_passes=well.n_passes,
            merge_rounds=well.merge_rounds,
            vregs=well.vregs_per_tile,
            bpv=well.out_cols,
            win_rows=well.win_rows,
            x_mode=str(x_mode),
            idroute=well.idroute,
            n_ex_groups=well.n_ex_groups,
            blk=well.block,
            sel_g=sel_g,
            sel_p4=sel_p4,
            sel_p2=sel_p2,
            compact=well.compact,
            g_rows=well.rows_per_vrow,
            sparse_groups=well.sparse_groups,
            interpret=interp,
        )
        if stray is not None:
            exm, exj, excr, excl, vals2, kn = stray
            o2 = out.reshape(
                -1, LANES if well.compact else well.out_cols
            )
            o2 = _stray_patch_call(
                exm, exj, excr, excl, vals2, o2, args[-1],
                n_stray=kn, interpret=interp,
            )
            out = o2.reshape(out.shape)
        return out

    gmap = well.gmap
    if gmap is None:
        gmap = jnp.zeros((well.q.shape[0], 1, 1), jnp.int32)
    if well.n_ex_groups:
        operands = (
            well.q, well.qv, well.ngv, well.ex_q, well.data, well.w,
            well.rts, gmap, well.ex_tw, x2d,
        )
    else:
        operands = (
            well.q, well.qv, well.ngv, jnp.zeros_like(well.q),
            well.data, well.w, well.rts, gmap,
            jnp.zeros((0,), jnp.int32), x2d,
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
    if well.compact:
        # kernel emitted row-major (T, out_rows, 128) chunks: the ravel
        # is a free view and the [:n] slice fuses into the consumer
        y = out.reshape(-1)[: well.shape[0]]
    else:
        # (T, vregs*8, B) → row-major rows; each vreg-row's first
        # rows_per_vrow lanes are real rows
        g = well.rows_per_vrow
        y = out.reshape(-1, well.out_cols)[:, :g].reshape(-1)[
            : well.shape[0]
        ]
    if well.extra_cols.size and stray is None:
        # x[extra_cols] as a scalarized element gather measured
        # ~16 ns/entry (~2 ms at the 1M 3-D fine level's 126k spills);
        # a 512 B x2d ROW gather + vectorized lane select is
        # stream-bound instead
        rows_e = jax.lax.div(well.extra_cols, jnp.int32(LANES))
        lanes_e = jax.lax.rem(well.extra_cols, jnp.int32(LANES))
        xr = jnp.take(x2d, rows_e, axis=0)
        xv = jnp.take_along_axis(xr, lanes_e[:, None], axis=1)[:, 0]
        contrib = well.extra_vals * xv
        # extras were deduped by row at build time: segment-sum the
        # per-entry products, then a sorted+unique scatter-add (XLA's
        # fast path; the general scatter-add dominated the glue time)
        sums = jax.ops.segment_sum(
            contrib.astype(y.dtype),
            well.extra_seg,
            num_segments=well.extra_rows.shape[0],
            indices_are_sorted=True,
        )
        # mode="drop": HaloWELL pads shards' extras to a common length
        # with out-of-range rows (sparse/well.py builds never emit them)
        y = y.at[well.extra_rows].add(
            sums, indices_are_sorted=True, unique_indices=True,
            mode="drop",
        )
    return y
