"""WELL — Windowed ELL: the TPU fast path for unstructured sparse
matrices.

The reference framework's ParSpmm (par_spmm.rs:37-84) pre-tiles an
arbitrary CSR into cache-friendly blocks once and then applies it many
times; WELL is the TPU analog.  Construction (here, host-side numpy,
setup-time) lays the matrix out so that the Pallas kernel
(`tpu_amg/ops/well_pallas.py`) can compute y = A·x with *only* on-chip
gathers:

* rows are packed 8-entries-per-block into (8, 128) slot vregs
  (`rows_per_vrow` rows per sublane row, multi-block rows merged in the
  kernel);
* each vreg gets a (8, 128) dedup *table* of the distinct x values its
  rows touch, filled from a per-tile x *window* [q, q+win_rows) of the
  (n/128, 128)-reshaped x — windows exist because the caller RCM-orders
  the matrix (utils/reorder.py), bounding each tile's column span;
* a value's table lane is forced to ``col % 128`` (sublane gathers
  preserve lanes), so two entries of the same vreg-row whose columns
  collide mod 128 cannot be gathered in one pass — such entries are
  split across up to ``max_passes`` gather passes;
* anything that does not fit (row-block budget, table stack of 8 per
  lane, pass budget) is spilled to a small COO `extras` tail applied via
  the XLA gather path — construction FAILS (WellUnsupported) instead if
  the spill fraction or the window span says the matrix is not
  band-structured enough.

All maps are static int8 arrays streamed alongside the values; per-nnz
traffic is ≈ value (4B) + λ/pid (2B) + ρ passes (~P B) + amortized
window, i.e. memory-bound like the reference's kernel rather than
gather-bound like plain ELL.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
TABLE_ROWS = 8
BLOCK = 8
BLOCKS_PER_VROW = LANES // BLOCK  # 16


class WellUnsupported(ValueError):
    """Matrix shape/structure outside what the WELL kernel handles."""


def _sorted_unique_inverse(keys: np.ndarray):
    """np.unique(keys, return_inverse=True) via argsort — this numpy
    build's np.unique is ~50x slower than a sort on large int arrays."""
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    new = np.empty(len(sk), dtype=bool)
    if len(sk):
        new[0] = True
        np.not_equal(sk[1:], sk[:-1], out=new[1:])
    uniq = sk[new]
    rank = np.cumsum(new) - 1
    inv = np.empty(len(sk), dtype=np.int64)
    inv[order] = rank
    return uniq, inv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WELL:
    """Windowed-ELL matrix; see module docstring.

    Array shapes (T = tiles, F = vregs/tile, M = F*8):
      q     (T,)              int32  window start row into x2d
      data  (T, M, 128)       dtype  entry values (0 in padded slots)
      w1    (T, M, 128)       int32  slot-domain word:
                                       bits 0-6   λ table lane
                                       bits 7-9   gather pass id
                                       bits 10-13 output route (source
                                                  block lane)
                                       bits 14-17 block-merge flags
                                                  (≤4 rounds)
      w2    (T, M, 128)       int32  table-domain word (the same
                                     physical (8,128) vreg read in two
                                     index domains):
                                       bits 3p..3p+2  table row for
                                                  pass p at (vreg-row,
                                                  table-lane), p < 4
                                       bits 12-18 amap: window row of
                                                  table slot (table-row,
                                                  table-lane)
      gb    (T, F, 3)         int32  per-vreg [grp_lo, grp_hi, n_passes]

    The kernel is stream-bound: the pallas input pipeline tops out at
    ~300 GB/s f32 and int8 slabs move at only ~155 GB/s effective (DMA +
    per-use int8→int32 converts), so ALL index maps are bit-packed into
    two int32 words per slot — streamed at full f32 rate and unpacked
    with single shift/mask ops.  10 bytes/slot f32 (8 + values).

    ``gb`` carries per-vreg *dynamic* bounds: the window-group range the
    vreg's table actually touches and the number of gather passes its
    entries need.  The kernel's grid loop runs on the TPU scalar core, so
    ``pl.when``-predicated groups/passes are real branches — skipped
    iterations cost ~nothing, making stage A/B cost proportional to each
    vreg's actual span/collision count instead of the global maxima.
    """

    q: jax.Array
    data: jax.Array
    w1: jax.Array
    w2: jax.Array
    gb: jax.Array
    extra_rows: jax.Array
    extra_cols: jax.Array
    extra_vals: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    win_rows: int = dataclasses.field(metadata=dict(static=True))
    x2d_rows: int = dataclasses.field(metadata=dict(static=True))
    rows_per_vrow: int = dataclasses.field(metadata=dict(static=True))
    vregs_per_tile: int = dataclasses.field(metadata=dict(static=True))
    n_passes: int = dataclasses.field(metadata=dict(static=True))
    merge_rounds: int = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )

    @property
    def nrows(self) -> int:
        return self.shape[0]

    @property
    def ncols(self) -> int:
        return self.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def n_extras(self) -> int:
        return int(self.extra_rows.shape[0])

    def mv(self, x: jax.Array) -> jax.Array:
        from tpu_amg.ops.well_pallas import well_spmv

        return well_spmv(self, x)

    def astype_values(self, dtype) -> "WELL":
        """Convert ONLY the value stream (bf16 values halve the dominant
        slab traffic; gathers/FMAs stay in the x dtype)."""
        return dataclasses.replace(
            self,
            data=self.data.astype(dtype),
            extra_vals=self.extra_vals.astype(dtype),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim > 1:
            return jnp.stack([self.mv(x[:, j]) for j in range(x.shape[1])], 1)
        return self.mv(x)

    def __repr__(self):
        slots = int(np.prod(self.data.shape))
        return (
            f"WELL(shape={self.shape}, nnz={self.nnz}, slots={slots} "
            f"(x{slots / max(self.nnz, 1):.2f}), win_rows={self.win_rows}, "
            f"passes={self.n_passes}, extras={self.n_extras}, "
            f"dtype={self.dtype})"
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_csr(
        csr,
        dtype=jnp.float32,
        vregs_per_tile: int | None = None,
        max_passes: int = 4,
        max_win_rows: int = 128,
        max_spill_frac: float = 0.02,
    ) -> "WELL":
        """Build from host CSR.  Raises WellUnsupported when the matrix
        is not band-structured enough (callers fall back to ELL).

        ``vregs_per_tile=None`` auto-sizes tiles: large tiles amortize
        the Pallas pipeline's per-grid-step cost (hardware sweep at 262k
        Delaunay: 8→326us, 16→284us, 32→247us, 64→360us — stage A's
        window-group loop grows with the tile's column span), falling
        back to smaller tiles when the wider window would blow the cap.
        """
        if vregs_per_tile is None:
            err = None
            for vpt in (32, 16, 8):
                try:
                    return WELL.from_csr(
                        csr, dtype=dtype, vregs_per_tile=vpt,
                        max_passes=max_passes, max_win_rows=max_win_rows,
                        max_spill_frac=max_spill_frac,
                    )
                except WellUnsupported as e:
                    err = e
            raise err
        n, ncols = csr.shape
        indptr = np.asarray(csr.indptr, dtype=np.int64)
        indices = np.asarray(csr.indices, dtype=np.int64)
        vals = np.asarray(csr.data, dtype=np.float64)
        nnz = len(indices)
        if nnz == 0 or n == 0:
            raise WellUnsupported("empty matrix")

        nnz_row = np.diff(indptr)
        rows_of = np.repeat(np.arange(n, dtype=np.int64), nnz_row)
        nb_full = np.maximum((nnz_row + BLOCK - 1) // BLOCK, 1)

        # ---- choose rows_per_vrow: largest g whose per-group block
        # demand fits the 16-block budget with tiny spill -------------
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
        if g is None:
            raise WellUnsupported("row density too irregular for WELL")
        v_rows = TABLE_ROWS * g  # rows per slot-vreg

        # ---- per-row block allowance within each group budget -------
        group_of = rows_of // g  # group id per entry (== global vreg-row)
        n_groups = -(-n // g)
        nb = np.minimum(nb_full, BLOCKS_PER_VROW)  # >16-block rows spill
        gsum = np.zeros(n_groups, dtype=np.int64)
        np.add.at(gsum, np.arange(n) // g, nb)
        for gi in np.flatnonzero(gsum > BLOCKS_PER_VROW):
            rows = np.arange(gi * g, min((gi + 1) * g, n))
            while nb[rows].sum() > BLOCKS_PER_VROW:
                r = rows[np.argmax(nb[rows])]
                nb[r] -= 1
        # exclusive cumsum of nb within each group → first block lane
        nb_pad = np.zeros(n_groups * g, dtype=np.int64)
        nb_pad[:n] = nb
        b0_pad = nb_pad.reshape(n_groups, g).cumsum(axis=1) - nb_pad.reshape(
            n_groups, g
        )
        b0 = b0_pad.reshape(-1)[:n]
        merge_rounds = int(np.ceil(np.log2(max(nb.max(), 1)))) if nb.max() > 1 else 0

        # ---- entry slots ---------------------------------------------
        k_in_row = np.arange(nnz) - np.repeat(indptr[:-1], nnz_row)
        keep = k_in_row < nb[rows_of] * BLOCK
        lane = (b0[rows_of] + k_in_row // BLOCK) * BLOCK + k_in_row % BLOCK
        vm = group_of  # global vreg-row id
        v_of_row = np.arange(n) // v_rows
        v_e = rows_of // v_rows  # vreg id per entry

        # ---- vreg/tile geometry --------------------------------------
        f = vregs_per_tile
        nv = -(-n // v_rows)
        t_count = -(-nv // f)
        nv_pad = t_count * f
        m_rows = f * TABLE_ROWS

        # ---- dedup table per vreg ------------------------------------
        pair_key = v_e[keep] * np.int64(ncols) + indices[keep]
        upairs, pair_inv = _sorted_unique_inverse(pair_key)
        pv = upairs // ncols
        pc = upairs % ncols
        plam = pc % LANES
        # stack rank within (vreg, lane), ordered by column
        order = np.lexsort((pc, plam, pv))
        sk = pv[order] * np.int64(LANES) + plam[order]
        newgrp = np.concatenate([[True], sk[1:] != sk[:-1]])
        grp_start = np.maximum.accumulate(
            np.where(newgrp, np.arange(len(sk)), 0)
        )
        stack_sorted = np.arange(len(sk)) - grp_start
        stack = np.empty(len(upairs), dtype=np.int64)
        stack[order] = stack_sorted
        pair_ok = stack < TABLE_ROWS

        # entries through dropped pairs spill
        keep_idx = np.flatnonzero(keep)
        e_ok = pair_ok[pair_inv]
        keep[keep_idx[~e_ok]] = False
        kept_pairs = pair_inv[e_ok]
        ke = keep_idx[e_ok]  # kept entry indices into the raw COO

        # ---- windows per tile ----------------------------------------
        vmin = np.full(nv_pad, np.int64(ncols), dtype=np.int64)
        vmax = np.zeros(nv_pad, dtype=np.int64)
        np.minimum.at(vmin, pv, pc)
        np.maximum.at(vmax, pv, pc)
        tmin = vmin.reshape(t_count, f).min(axis=1)
        tmax = vmax.reshape(t_count, f).max(axis=1)
        tmax = np.maximum(tmax, tmin)
        # 8-align window starts: the resident-x kernel mode slices the
        # window out of a VMEM-pinned x2d with sublane-aligned pl.ds
        q = (tmin // LANES) & ~np.int64(7)
        win_rows = int((tmax // LANES - q).max() + 1)
        if win_rows > max_win_rows:
            raise WellUnsupported(
                f"tile column span {win_rows * LANES} exceeds the window "
                f"cap {max_win_rows * LANES}; matrix too unbanded (RCM it)"
            )
        win_rows = max(win_rows, TABLE_ROWS)
        win_rows = -(-win_rows // TABLE_ROWS) * TABLE_ROWS
        x2d_rows = int((q + win_rows).max())
        x2d_rows = max(x2d_rows, -(-ncols // LANES))
        x2d_rows = -(-x2d_rows // TABLE_ROWS) * TABLE_ROWS

        # ---- amap -----------------------------------------------------
        amap = np.zeros((nv_pad, TABLE_ROWS, LANES), dtype=np.int8)
        ok = np.flatnonzero(pair_ok)
        hi = pc[ok] // LANES - q[pv[ok] // f]
        amap[pv[ok], stack[ok], plam[ok]] = hi.astype(np.int8)

        # ---- pass ids + rho -------------------------------------------
        vm_k = vm[ke]  # global vreg-row per kept entry
        lam_k = plam[kept_pairs].astype(np.int64)
        stk_k = stack[kept_pairs]
        trip = (vm_k * LANES + lam_k) * TABLE_ROWS + stk_k
        utrip, trip_inv = _sorted_unique_inverse(trip)
        tvl = utrip // TABLE_ROWS  # (vm, lane) key per distinct triple
        newg = np.concatenate([[True], tvl[1:] != tvl[:-1]])
        gstart = np.maximum.accumulate(
            np.where(newg, np.arange(len(utrip)), 0)
        )
        passid_u = np.arange(len(utrip)) - gstart
        pass_k = passid_u[trip_inv]
        n_passes = int(min(pass_k.max(initial=0) + 1, max_passes))

        over_pass = pass_k >= max_passes
        if over_pass.any():
            keep[ke[over_pass]] = False
            sel = ~over_pass
            ke, vm_k, lam_k, stk_k, pass_k = (
                ke[sel], vm_k[sel], lam_k[sel], stk_k[sel], pass_k[sel]
            )

        spilled = nnz - len(ke)
        if spilled > max_spill_frac * nnz:
            raise WellUnsupported(
                f"{spilled}/{nnz} entries spill outside the WELL layout"
            )

        rho = np.zeros((nv_pad * TABLE_ROWS, max(n_passes, 1), LANES),
                       dtype=np.int8)
        u_ok = passid_u < max_passes
        u_vm = utrip // (TABLE_ROWS * LANES)
        u_lam = (utrip // TABLE_ROWS) % LANES
        u_stk = utrip % TABLE_ROWS
        rho[u_vm[u_ok], passid_u[u_ok], u_lam[u_ok]] = u_stk[u_ok].astype(
            np.int8
        )

        # ---- slot arrays ----------------------------------------------
        lam_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int8)
        pid_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int8)
        data_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.float64)
        lane_k = lane[ke]
        lam_a[vm_k, lane_k] = lam_k.astype(np.int8)
        pid_a[vm_k, lane_k] = pass_k.astype(np.int8)
        data_a[vm_k, lane_k] = vals[ke]

        # ---- merge masks + route ---------------------------------------
        mr = max(merge_rounds, 1)
        cont = np.zeros((nv_pad * TABLE_ROWS, mr, BLOCKS_PER_VROW),
                        dtype=np.int8)
        if merge_rounds:
            # block → row map per vreg-row
            rr = np.repeat(np.arange(n), nb)
            cum = np.concatenate([[0], np.cumsum(nb)[:-1]])
            bi = (b0[rr] + np.arange(nb.sum()) - np.repeat(cum, nb))
            brow = -np.ones((nv_pad * TABLE_ROWS, BLOCKS_PER_VROW),
                            dtype=np.int64)
            brow[rr // g, bi] = rr
            for k in range(merge_rounds):
                s = 1 << k
                same = np.zeros_like(cont[:, k], dtype=bool)
                same[:, : BLOCKS_PER_VROW - s] = (
                    (brow[:, : BLOCKS_PER_VROW - s] == brow[:, s:])
                    & (brow[:, s:] >= 0)
                )
                jj = np.arange(BLOCKS_PER_VROW)[None, :]
                base = np.zeros_like(brow)
                rows_valid = brow >= 0
                base[rows_valid] = b0[brow[rows_valid]]
                aligned = ((jj - base) % (s << 1)) == 0
                cont[:, k] = (same & aligned).astype(np.int8)

        route = np.zeros((nv_pad * TABLE_ROWS, BLOCKS_PER_VROW),
                         dtype=np.int8)
        route[np.arange(n) // g, np.arange(n) % g] = b0.astype(np.int8)

        # ---- per-vreg dynamic bounds (kernel skip predicates) -----------
        n_groups_win = (win_rows + TABLE_ROWS - 1) // TABLE_ROWS
        q_of_v = np.repeat(q, f)[:nv_pad]
        has_pairs = vmax >= vmin
        # divide only the real branch by TABLE_ROWS; the empty-vreg
        # sentinels (n_groups_win / -1) are already in group units
        glo = np.where(
            has_pairs, (vmin // LANES - q_of_v) // TABLE_ROWS, n_groups_win
        )
        ghi = np.where(
            has_pairs, (vmax // LANES - q_of_v) // TABLE_ROWS, -1
        )
        glo = np.clip(glo, 0, n_groups_win - 1)
        ghi = np.clip(ghi, -1, n_groups_win - 1)
        p_hi = np.zeros(nv_pad, dtype=np.int64)
        if len(ke):
            np.maximum.at(p_hi, vm_k // TABLE_ROWS, pass_k + 1)
        gb = np.stack(
            [glo, np.where(has_pairs, ghi, -1), p_hi], axis=-1
        ).astype(np.int32)

        # ---- extras -----------------------------------------------------
        ex = np.flatnonzero(~keep)

        # ---- pack to (T, ...) device arrays -----------------------------
        def tile(a, inner):
            return jnp.asarray(
                a.reshape((t_count,) + inner), dtype=a.dtype
            )

        # slot-domain word: lam | pid<<7 | route<<10 | merge flags<<14
        assert merge_rounds <= 4 and n_passes <= 4
        w1 = (
            lam_a.astype(np.int64)
            | (pid_a.astype(np.int64) << 7)
        )
        w1[:, :BLOCKS_PER_VROW] |= route.astype(np.int64) << 10
        for k in range(merge_rounds):
            w1[:, :BLOCKS_PER_VROW] |= cont[:, k].astype(np.int64) << (
                14 + k
            )
        # table-domain word: rho per pass at bits 3p, amap at bits 12-18
        w2 = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int64)
        for p in range(max(n_passes, 1)):
            w2 |= rho.reshape(nv_pad * TABLE_ROWS, -1, LANES)[
                :, p
            ].astype(np.int64) << (3 * p)
        w2 |= amap.reshape(nv_pad * TABLE_ROWS, LANES).astype(
            np.int64
        ) << 12
        return WELL(
            q=jnp.asarray(q, dtype=jnp.int32),
            data=jnp.asarray(
                data_a.reshape(t_count, m_rows, LANES), dtype=dtype
            ),
            w1=tile(w1.astype(np.int32), (m_rows, LANES)),
            w2=tile(w2.astype(np.int32), (m_rows, LANES)),
            gb=jnp.asarray(gb.reshape(t_count, f, 3), dtype=jnp.int32),
            extra_rows=jnp.asarray(rows_of[ex], dtype=jnp.int32),
            extra_cols=jnp.asarray(indices[ex], dtype=jnp.int32),
            extra_vals=jnp.asarray(vals[ex], dtype=dtype),
            shape=(int(n), int(ncols)),
            nnz=int(nnz),
            win_rows=int(win_rows),
            x2d_rows=int(x2d_rows),
            rows_per_vrow=int(g),
            vregs_per_tile=int(f),
            n_passes=int(max(n_passes, 1)),
            merge_rounds=int(merge_rounds),
            block_size=int(getattr(csr, "block_size", 1)),
        )
