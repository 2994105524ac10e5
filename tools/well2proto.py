"""WELL v2 prototype (dev harness): tile-batched MXU reduce, single
packed index word, per-vreg window bases.

Round-3 ablation (tools/wellablate.py, 1M jittered-Delaunay, v5e):
  full 541.7us | streamonly 231.5us | nored 318.1us
→ the per-vreg (8,16) reduce chain costs ~224us (narrow ops + dependent
rolls + narrow stores), while stages A+B largely hide under the 231us
slab stream.  v2 attacks exactly that:

  1. contribs are buffered per tile and reduced ONCE per tile:
     block sums = (M,128) @ (128,16) static 0/1 matrix on the MXU,
     merges/routes as (M,16)-wide ops — 32x fewer narrow-op calls.
  2. index words packed into ONE int32/slot (lam 7 | pid 2 | rho 3x4 |
     amap 7 = 28 bits): 8B/slot streamed instead of 12B → stream floor
     drops from ~205us to ~141us at 1M.
     route/merge bits move to a narrow (M,16) int32 sidecar (rts).
  3. per-vreg 8-aligned window bases (qv): stage A loops over the
     vreg's OWN span (~5-6 groups at 1M) instead of the tile's (13).

Usage: python tools/well2proto.py [side] [reps] [variant ...]
Variants: v2 (all three), v2tile (tile windows, no per-vreg qv)
"""
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_amg.utils.platform import apply_env_platform

apply_env_platform()

LANES = 128
TABLE_ROWS = 8
BLOCK = 8
BLOCKS_PER_VROW = 16


def _sync(x):
    return float(np.asarray(x.ravel()[0]))


def build_v2(csr_indptr, csr_indices, csr_data, n, ncols, F=32,
             max_passes=4, max_spill_frac=0.02, g_force=None):
    """Host-side v2 layout build. Returns dict of arrays + meta."""
    from tpu_amg.sparse.well import _sorted_unique_inverse

    indptr = np.asarray(csr_indptr, dtype=np.int64)
    indices = np.asarray(csr_indices, dtype=np.int64)
    vals = np.asarray(csr_data, dtype=np.float64)
    nnz = len(indices)
    nnz_row = np.diff(indptr)
    rows_of = np.repeat(np.arange(n, dtype=np.int64), nnz_row)
    nb_full = np.maximum((nnz_row + BLOCK - 1) // BLOCK, 1)

    # rows_per_vrow g: largest fitting the 16-block budget
    if g_force is not None:
        g = g_force
    else:
        g = None
        for cand in range(BLOCKS_PER_VROW, 0, -1):
            n_groups = -(-n // cand)
            pad_rows = n_groups * cand - n
            demand = np.concatenate([
                np.minimum(nb_full, BLOCKS_PER_VROW),
                np.zeros(pad_rows, np.int64),
            ])
            gsum = demand.reshape(n_groups, cand).sum(axis=1)
            over = np.maximum(gsum - BLOCKS_PER_VROW, 0).sum()
            if over * BLOCK <= max(max_spill_frac * nnz / 4, 0.0):
                g = cand
                break
        assert g is not None
    v_rows = TABLE_ROWS * g

    group_of = rows_of // g
    n_groups = -(-n // g)
    nb = np.minimum(nb_full, BLOCKS_PER_VROW)
    gsum = np.zeros(n_groups, dtype=np.int64)
    np.add.at(gsum, np.arange(n) // g, nb)
    for gi in np.flatnonzero(gsum > BLOCKS_PER_VROW):
        rows = np.arange(gi * g, min((gi + 1) * g, n))
        while nb[rows].sum() > BLOCKS_PER_VROW:
            r = rows[np.argmax(nb[rows])]
            nb[r] -= 1
    nb_pad = np.zeros(n_groups * g, dtype=np.int64)
    nb_pad[:n] = nb
    b0_pad = nb_pad.reshape(n_groups, g).cumsum(axis=1) - nb_pad.reshape(
        n_groups, g)
    b0 = b0_pad.reshape(-1)[:n]
    merge_rounds = int(np.ceil(np.log2(max(nb.max(), 1)))) if nb.max() > 1 else 0
    assert merge_rounds <= 4

    k_in_row = np.arange(nnz) - np.repeat(indptr[:-1], nnz_row)
    keep = k_in_row < nb[rows_of] * BLOCK
    lane = (b0[rows_of] + k_in_row // BLOCK) * BLOCK + k_in_row % BLOCK
    vm = group_of
    v_e = rows_of // v_rows

    nv = -(-n // v_rows)
    t_count = -(-nv // F)
    nv_pad = t_count * F
    m_rows = F * TABLE_ROWS

    # dedup table per vreg
    pair_key = v_e[keep] * np.int64(ncols) + indices[keep]
    upairs, pair_inv = _sorted_unique_inverse(pair_key)
    pv = upairs // ncols
    pc = upairs % ncols
    plam = pc % LANES
    order = np.lexsort((pc, plam, pv))
    sk = pv[order] * np.int64(LANES) + plam[order]
    newgrp = np.concatenate([[True], sk[1:] != sk[:-1]])
    grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(sk)), 0))
    stack_sorted = np.arange(len(sk)) - grp_start
    stack = np.empty(len(upairs), dtype=np.int64)
    stack[order] = stack_sorted
    pair_ok = stack < TABLE_ROWS

    keep_idx = np.flatnonzero(keep)
    e_ok = pair_ok[pair_inv]
    keep[keep_idx[~e_ok]] = False
    kept_pairs = pair_inv[e_ok]
    ke = keep_idx[e_ok]

    # per-vreg windows
    vmin = np.full(nv_pad, np.int64(ncols), dtype=np.int64)
    vmax = np.zeros(nv_pad, dtype=np.int64)
    np.minimum.at(vmin, pv, pc)
    np.maximum.at(vmax, pv, pc)
    has_pairs = vmax >= vmin
    qv = np.where(has_pairs, (vmin // LANES) & ~np.int64(7), 0)
    span = np.where(has_pairs, vmax // LANES - qv + 1, 1)
    if span.max() > 128:
        raise ValueError(f"vreg span {span.max()} rows > 128 (RCM it)")
    ng_v = (span + 7) // 8
    NG = int(ng_v.max())

    # tile window for blocked/dma modes
    q_t = qv.reshape(t_count, F).min(axis=1)
    win_end = (qv + 8 * ng_v).reshape(t_count, F).max(axis=1)
    win_rows = int((win_end - q_t).max())
    win_rows = -(-win_rows // 8) * 8
    x2d_rows = int((qv + 8 * ng_v).max())
    x2d_rows = max(x2d_rows, -(-ncols // LANES))
    x2d_rows = -(-x2d_rows // 8) * 8

    # amap (relative to qv)
    amap = np.zeros((nv_pad, TABLE_ROWS, LANES), dtype=np.int64)
    ok = np.flatnonzero(pair_ok)
    hi = pc[ok] // LANES - qv[pv[ok]]
    assert hi.max(initial=0) < 128 and hi.min(initial=0) >= 0
    amap[pv[ok], stack[ok], plam[ok]] = hi

    # passes
    vm_k = vm[ke]
    lam_k = plam[kept_pairs].astype(np.int64)
    stk_k = stack[kept_pairs]
    trip = (vm_k * LANES + lam_k) * TABLE_ROWS + stk_k
    utrip, trip_inv = _sorted_unique_inverse(trip)
    tvl = utrip // TABLE_ROWS
    newg = np.concatenate([[True], tvl[1:] != tvl[:-1]])
    gstart = np.maximum.accumulate(np.where(newg, np.arange(len(utrip)), 0))
    passid_u = np.arange(len(utrip)) - gstart
    pass_k = passid_u[trip_inv]
    n_passes = int(min(pass_k.max(initial=0) + 1, max_passes))

    over_pass = pass_k >= max_passes
    if over_pass.any():
        keep[ke[over_pass]] = False
        sel = ~over_pass
        ke, vm_k, lam_k, stk_k, pass_k = (
            ke[sel], vm_k[sel], lam_k[sel], stk_k[sel], pass_k[sel])

    spilled = nnz - len(ke)
    if spilled > max_spill_frac * nnz:
        raise ValueError(f"{spilled}/{nnz} spill")

    rho = np.zeros((nv_pad * TABLE_ROWS, max_passes, LANES), dtype=np.int64)
    u_ok = passid_u < max_passes
    u_vm = utrip // (TABLE_ROWS * LANES)
    u_lam = (utrip // TABLE_ROWS) % LANES
    u_stk = utrip % TABLE_ROWS
    rho[u_vm[u_ok], passid_u[u_ok], u_lam[u_ok]] = u_stk[u_ok]

    lam_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int64)
    pid_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int64)
    data_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.float64)
    lane_k = lane[ke]
    lam_a[vm_k, lane_k] = lam_k
    pid_a[vm_k, lane_k] = pass_k
    data_a[vm_k, lane_k] = vals[ke]

    # packed word: lam | pid<<7 | rho_p<<(9+3p) | amap<<21
    w = lam_a | (pid_a << 7)
    for p in range(max_passes):
        w |= rho[:, p] << (9 + 3 * p)
    w |= amap.reshape(nv_pad * TABLE_ROWS, LANES) << 21
    assert w.max() < (1 << 31)

    # rts narrow sidecar: route(0-3 at lane j) | merge flags (4-7 at
    # block lane b)
    rts = np.zeros((nv_pad * TABLE_ROWS, BLOCKS_PER_VROW), dtype=np.int64)
    rts[np.arange(n) // g, np.arange(n) % g] |= b0
    if merge_rounds:
        rr = np.repeat(np.arange(n), nb)
        cum = np.concatenate([[0], np.cumsum(nb)[:-1]])
        bi = (b0[rr] + np.arange(nb.sum()) - np.repeat(cum, nb))
        brow = -np.ones((nv_pad * TABLE_ROWS, BLOCKS_PER_VROW),
                        dtype=np.int64)
        brow[rr // g, bi] = rr
        for k in range(merge_rounds):
            s = 1 << k
            same = np.zeros((nv_pad * TABLE_ROWS, BLOCKS_PER_VROW),
                            dtype=bool)
            same[:, : BLOCKS_PER_VROW - s] = (
                (brow[:, : BLOCKS_PER_VROW - s] == brow[:, s:])
                & (brow[:, s:] >= 0))
            jj = np.arange(BLOCKS_PER_VROW)[None, :]
            base = np.zeros_like(brow)
            rows_valid = brow >= 0
            base[rows_valid] = b0[brow[rows_valid]]
            aligned = ((jj - base) % (s << 1)) == 0
            rts |= (same & aligned).astype(np.int64) << (4 + k)

    # per-tile pass/group bounds
    phi_v = np.zeros(nv_pad, dtype=np.int64)
    if len(ke):
        np.maximum.at(phi_v, vm_k // TABLE_ROWS, pass_k + 1)
    pt = phi_v.reshape(t_count, F).max(axis=1)
    gt = ng_v.reshape(t_count, F).max(axis=1)

    ex = np.flatnonzero(~keep)
    qv_rel = qv - np.repeat(q_t, F)

    return dict(
        q=q_t.astype(np.int32), qv=qv.astype(np.int32),
        qv_rel=qv_rel.astype(np.int32),
        pt=pt.astype(np.int32), gt=gt.astype(np.int32),
        data=data_a.reshape(t_count, m_rows, LANES),
        w=w.reshape(t_count, m_rows, LANES).astype(np.int32),
        rts=rts.reshape(t_count, m_rows, BLOCKS_PER_VROW).astype(np.int32),
        extra_rows=rows_of[ex].astype(np.int32),
        extra_cols=indices[ex].astype(np.int32),
        extra_vals=vals[ex],
        n=n, ncols=ncols, nnz=nnz, g=g, F=F, t_count=t_count,
        NG=NG, n_passes=n_passes, merge_rounds=merge_rounds,
        win_rows=win_rows, x2d_rows=x2d_rows,
        slots=int(np.prod(data_a.shape)),
    )


def make_v3_kernel(NG, n_passes, merge_rounds, F):
    """v3 = v2 + loop-transposed stage A with a per-tile group bound:
    the group loop moves OUTSIDE the vreg loop so a single scalar branch
    (pl.when(gi < gt[t])) skips a group for all F vregs at once — per-
    vreg branches cost ~7 cycles each (round-3 mode-2 lesson) but one
    branch per 32 vregs amortizes to nothing.  Needs tile-wide scratch
    for tables/eta/grp."""
    mrows = F * TABLE_ROWS

    def kernel(q_ref, qv_ref, gt_ref, data_ref, w_ref, rts_ref, x_ref,
               y_ref, cbuf, table_s, eta_s, grp_s):
        t = pl.program_id(0)
        cdt = x_ref.dtype
        # prep: unpack table-domain fields for the whole tile
        for f in range(F):
            r0 = f * 8
            amap = (w_ref[0, r0:r0 + 8, :] >> 21) & 1023
            eta_s[r0:r0 + 8, :] = amap & 7
            grp_s[r0:r0 + 8, :] = amap >> 3
        table_s[:] = jnp.zeros((mrows, LANES), dtype=cdt)
        # stage A, group-major with per-tile bound
        for gi in range(NG):
            @pl.when(gi < gt_ref[t])
            def _(gi=gi):
                for f in range(F):
                    r0 = f * 8
                    qv = pl.multiple_of(qv_ref[t * F + f], 8)
                    part = jnp.take_along_axis(
                        x_ref[pl.ds(qv + gi * 8, 8), :],
                        eta_s[r0:r0 + 8, :], axis=0)
                    pltpu.store(
                        table_s.at[pl.ds(r0, 8), :], part,
                        mask=grp_s[r0:r0 + 8, :] == gi)
        # stage B + FMA per vreg
        for f in range(F):
            r0 = f * 8
            w = w_ref[0, r0:r0 + 8, :]
            lam = w & 127
            pid = (w >> 7) & 3
            table = table_s[r0:r0 + 8, :]
            gathered = jnp.zeros((8, 128), dtype=cdt)
            for p in range(n_passes):
                rowsel = jnp.take_along_axis(
                    table, (w >> (9 + 3 * p)) & 7, axis=0)
                val = jnp.take_along_axis(rowsel, lam, axis=-1)
                gathered = jnp.where(pid == p, val, gathered)
            cbuf[r0:r0 + 8, :] = (
                data_ref[0, r0:r0 + 8, :].astype(cdt) * gathered)
        mblk = (jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 0) // 8
                == jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 1)
                ).astype(cdt)
        cm = jnp.dot(cbuf[:], mblk, preferred_element_type=cdt,
                     precision=jax.lax.Precision.HIGHEST)
        rts = rts_ref[0]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (mrows, 16), 1)
        for k in range(merge_rounds):
            idx = jnp.minimum(iota16 + (1 << k), 15)
            shifted = jnp.take_along_axis(cm, idx, axis=-1)
            mask = (rts >> (4 + k)) & 1
            cm = cm + jnp.where(mask != 0, shifted, jnp.zeros_like(cm))
        yv = jnp.take_along_axis(cm, rts & 15, axis=-1)
        y_ref[0] = yv

    return kernel


def dataonly_call(b, dtype=jnp.float32, interpret=False):
    F = b["F"]
    mrows = F * TABLE_ROWS
    t_count = b["t_count"]
    data = jnp.asarray(b["data"], dtype)

    def block(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda t: (t,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)

    def kernel(data_ref, y_ref):
        acc = data_ref[0, 0:8, :]
        for f in range(1, F):
            acc = acc + data_ref[0, f * 8:f * 8 + 8, :]
        for f in range(F):
            y_ref[0, f * 8:f * 8 + 8, :] = acc[:, :16]

    @jax.jit
    def run(x2d):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (t_count, mrows, BLOCKS_PER_VROW), jnp.float32),
                grid=(t_count,),
                in_specs=[block((mrows, LANES))],
                out_specs=block((mrows, BLOCKS_PER_VROW)),
                interpret=interpret,
            )(data)

    return run


def v3_call(b, dtype=jnp.float32, interpret=False):
    F = b["F"]
    mrows = F * TABLE_ROWS
    t_count = b["t_count"]
    data = jnp.asarray(b["data"], dtype)
    w = jnp.asarray(b["w"])
    rts = jnp.asarray(b["rts"])
    q = jnp.asarray(b["q"])
    qv = jnp.asarray(b["qv"])
    gt = jnp.asarray(b["gt"])

    def block(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda t, q_ref, qv_ref, gt_ref: (t,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_count,),
        in_specs=[
            block((mrows, LANES)),
            block((mrows, LANES)),
            block((mrows, BLOCKS_PER_VROW)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=block((mrows, BLOCKS_PER_VROW)),
        scratch_shapes=[
            pltpu.VMEM((mrows, LANES), jnp.float32),  # cbuf
            pltpu.VMEM((mrows, LANES), jnp.float32),  # table_s
            pltpu.VMEM((mrows, LANES), jnp.int32),  # eta_s
            pltpu.VMEM((mrows, LANES), jnp.int32),  # grp_s
        ],
    )
    kernel = make_v3_kernel(b["NG"], b["n_passes"], b["merge_rounds"], F)

    @jax.jit
    def run(x2d):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (t_count, mrows, BLOCKS_PER_VROW), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(q, qv, gt, data, w, rts, x2d)

    return run


def make_v2_kernel(NG, n_passes, merge_rounds, F, per_vreg_windows,
                   ablate="", reduce="mxu_highest"):
    mrows = F * TABLE_ROWS

    def kernel(q_ref, qv_ref, pt_ref, data_ref, w_ref, rts_ref, x_ref,
               y_ref, cbuf, table_s, gath_s):
        t = pl.program_id(0)
        cdt = x_ref.dtype
        if "streamonly" in ablate:
            acc = data_ref[0, 0:8, :]
            for f in range(1, F):
                acc = acc + data_ref[0, f * 8:f * 8 + 8, :]
            acc = acc + w_ref[0, 0:8, :].astype(cdt)
            for f in range(F):
                y_ref[0, f * 8:f * 8 + 8, :] = acc[:, :16]
            return
        for f in range(F):
            r0 = f * 8
            w = w_ref[0, r0:r0 + 8, :]
            amap = (w >> 21) & 127
            eta = amap & 7
            grp = amap >> 3
            if per_vreg_windows:
                qv = pl.multiple_of(qv_ref[t * F + f], 8)
            else:
                qv = pl.multiple_of(q_ref[t], 8)
            if "noA" in ablate:
                table = x_ref[pl.ds(qv, 8), :]
            else:
                table_s[:] = jnp.zeros((8, 128), dtype=cdt)
                for gi in range(NG):
                    part = jnp.take_along_axis(
                        x_ref[pl.ds(qv + gi * 8, 8), :], eta, axis=0)
                    pltpu.store(table_s, part, mask=grp == gi)
                table = table_s[:]
            lam = w & 127
            pid = (w >> 7) & 3
            if "noB" in ablate:
                gathered = table
            else:
                gath_s[:] = jnp.zeros((8, 128), dtype=cdt)
                for p in range(n_passes):
                    rowsel = jnp.take_along_axis(
                        table, (w >> (9 + 3 * p)) & 7, axis=0)
                    val = jnp.take_along_axis(rowsel, lam, axis=-1)
                    pltpu.store(gath_s, val, mask=pid == p)
                gathered = gath_s[:]
            cbuf[r0:r0 + 8, :] = (
                data_ref[0, r0:r0 + 8, :].astype(cdt) * gathered)
        if "nored" in ablate:
            for f in range(F):
                r0 = f * 8
                y_ref[0, r0:r0 + 8, :] = cbuf[r0:r0 + 8, :16]
            return
        # ---- tile-batched reduce -------------------------------------
        if reduce == "roll":
            red = cbuf[:]
            for shift in (1, 2, 4):
                red = red + pltpu.roll(red, LANES - shift, 1)
            # Mosaic gathers need idx.shape == operand.shape: compact
            # full-width, then slice the 16 block lanes
            cidx = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (mrows, LANES), 1)
                * 8, 127)
            cm = jnp.take_along_axis(red, cidx, axis=-1)[:, :16]
        else:
            mblk = (jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 0)
                    // 8
                    == jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 1)
                    ).astype(cdt)
            # HIGHEST: the default TPU matmul rounds inputs to bf16
            # (measured 2.7e-3 relerr); HIGH = bf16x3 (~f32-accurate)
            prec = (jax.lax.Precision.HIGH if reduce == "mxu_high"
                    else jax.lax.Precision.HIGHEST)
            cm = jnp.dot(cbuf[:], mblk, preferred_element_type=cdt,
                         precision=prec)
        rts = rts_ref[0]
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (mrows, 16), 1)
        for k in range(merge_rounds):
            idx = jnp.minimum(iota16 + (1 << k), 15)
            shifted = jnp.take_along_axis(cm, idx, axis=-1)
            mask = (rts >> (4 + k)) & 1
            cm = cm + jnp.where(mask != 0, shifted, jnp.zeros_like(cm))
        yv = jnp.take_along_axis(cm, rts & 15, axis=-1)
        y_ref[0] = yv

    return kernel


def v2_call(b, dtype=jnp.float32, per_vreg_windows=True, interpret=False,
            ablate="", reduce="mxu_highest"):
    F = b["F"]
    mrows = F * TABLE_ROWS
    t_count = b["t_count"]
    data = jnp.asarray(b["data"], dtype)
    w = jnp.asarray(b["w"])
    rts = jnp.asarray(b["rts"])
    q = jnp.asarray(b["q"])
    qv = jnp.asarray(b["qv"])
    pt = jnp.asarray(b["pt"])
    n2d = b["x2d_rows"]

    def block(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda t, q_ref, qv_ref, pt_ref: (t,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_count,),
        in_specs=[
            block((mrows, LANES)),  # data
            block((mrows, LANES)),  # w
            block((mrows, BLOCKS_PER_VROW)),  # rts
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=block((mrows, BLOCKS_PER_VROW)),
        scratch_shapes=[
            pltpu.VMEM((mrows, LANES), jnp.float32),  # cbuf
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
    )
    kernel = make_v2_kernel(b["NG"], b["n_passes"], b["merge_rounds"], F,
                            per_vreg_windows, ablate=ablate, reduce=reduce)

    @jax.jit
    def run(x2d):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (t_count, mrows, BLOCKS_PER_VROW), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(q, qv, pt, data, w, rts, x2d)

    return run


def main():
    from bench import unstructured_fem_system
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    variants = sys.argv[3:] or ["v2", "v2tile"]

    on_tpu = jax.devices()[0].platform == "tpu"
    ap = unstructured_fem_system(side)
    n = ap.shape[0]
    import os as _os
    F_env = int(_os.environ.get("WELL2_F", "32"))
    t0 = time.perf_counter()
    b = build_v2(ap.indptr, ap.indices, ap.data, n, n, F=F_env)
    print(f"# build {time.perf_counter()-t0:.1f}s slots={b['slots']} "
          f"(x{b['slots']/b['nnz']:.2f}) g={b['g']} NG={b['NG']} "
          f"passes={b['n_passes']} mr={b['merge_rounds']} "
          f"win_rows={b['win_rows']} extras={len(b['extra_rows'])} "
          f"tiles={b['t_count']}", flush=True)

    rng = np.random.default_rng(0)
    x = rng.normal(size=n)
    n2d = b["x2d_rows"]
    xp = np.pad(x, (0, n2d * LANES - n))
    x2d = jnp.asarray(xp.reshape(n2d, LANES), jnp.float32)

    y_ref = ap @ x  # scipy ground truth

    g = b["g"]
    for var in variants:
        if var == "v3":
            run = v3_call(b, interpret=not on_tpu)
        elif var == "dataonly":
            run = dataonly_call(b, interpret=not on_tpu)
        elif var in ("v2high", "v2roll"):
            red = {"v2high": "mxu_high", "v2roll": "roll"}[var]
            run = v2_call(b, interpret=not on_tpu, reduce=red)
        else:
            pvw = var != "v2tile"
            ab = "" if var in ("v2", "v2tile") else var
            run = v2_call(b, per_vreg_windows=pvw, interpret=not on_tpu,
                          ablate=ab)
        out = run(x2d)
        y = np.asarray(out).reshape(-1, BLOCKS_PER_VROW)[:, :g].reshape(-1)[:n]
        if len(b["extra_rows"]):
            np.add.at(y, b["extra_rows"],
                      b["extra_vals"] * x[b["extra_cols"]])
        err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
        # timing: chain kernel calls with a scalar dependence (adds one
        # ~14us x2d copy per rep at 1M; constant across variants)
        if on_tpu:
            @jax.jit
            def chain(x2d):
                def body(c, _):
                    o = run(x2d + c)
                    return o[0, 0, 0] * 0, None
                c, _ = jax.lax.scan(
                    body, jnp.float32(0), None, length=reps)
                return c

            _sync(chain(x2d))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(chain(x2d))
                best = min(best, (time.perf_counter() - t0) / reps)
            gnnzs = b["nnz"] / best / 1e9
            print(f"# {var:8s} {best*1e6:8.1f}us {gnnzs:7.2f} Gnnz/s "
                  f"relerr={err:.2e}", flush=True)
        else:
            print(f"# {var:8s} (cpu interpret) relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
