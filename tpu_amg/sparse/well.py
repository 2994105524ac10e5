"""WELL — Windowed ELL: the TPU fast path for unstructured sparse
matrices.

The reference framework's ParSpmm (par_spmm.rs:37-84) pre-tiles an
arbitrary CSR into cache-friendly blocks once and then applies it many
times; WELL is the TPU analog.  Construction (host-side numpy, setup
time) lays the matrix out so the Pallas kernel
(`tpu_amg/ops/well_pallas.py`) computes y = A·x with *only* on-chip
gathers:

* rows are packed ``block`` entries per lane-block into (8, 128) slot
  vregs (``rows_per_vrow`` rows share each sublane row, multi-block
  rows summed by in-kernel merges);
* each vreg gets an (8, 128) dedup *table* of the distinct x values its
  rows touch, filled by masked sublane gathers from the vreg's own
  8-aligned window [qv, qv + 8·ng) of the (n/128, 128)-reshaped x —
  windows exist because the caller RCM-orders the matrix
  (utils/reorder.py), bounding each vreg's column span;
* a value's table lane is forced to ``col % 128`` (sublane gathers
  preserve lanes), so two entries of one vreg needing the same table
  lane but different stack rows are split across up to 4 gather passes;
* anything that does not fit (row-block budget, 8-deep table stack per
  lane, pass budget) spills to a small COO ``extras`` tail applied via
  the XLA gather path — construction FAILS (WellUnsupported) instead if
  the spill fraction or a vreg's span says the matrix is not
  band-structured enough.

Second-generation layout (round 4), shaped by the round-3 hardware
ablation on the 1M jittered-Delaunay system (v5e, tools/wellablate.py:
full 542 us = stream 231 + stages A/B ~88 + per-vreg reduce 224):

1. **Tile-batched MXU reduce.**  The v1 reduce ran per vreg on narrow
   (8, 16) arrays — dependent roll chains and narrow stores cost 224 us,
   more than both gather stages together.  v2 buffers all contributions
   of a tile and reduces ONCE: block sums = (M, 128) @ (128, B) with a
   static 0/1 selection matrix on the MXU (Precision.HIGHEST: the
   default TPU matmul rounds inputs to bf16, measured 2.7e-3 relerr;
   with exact 0/1 selectors HIGHEST is exact), then merges/routes as
   (M, B)-wide ops — 32x fewer narrow-op invocations.  Measured 224 us
   → 127 us at 1M.
2. **One packed index word per slot** (lam 7 | pid 2 | rho 3x4 |
   amap 10 = 31 bits): 8 B/slot streamed instead of v1's 12; route and
   merge bits move to a narrow (M, B) int32 sidecar ``rts``.
3. **Per-vreg 8-aligned window bases** (``qv``): stage A loops over the
   vreg's OWN span instead of the tile's (13 groups → ~7 at 1M 2-D),
   and the 10-bit relative row field supports spans to 1024 rows —
   wide enough for 3-D RCM bands (~580 rows at 1M, utils/problems.py
   unstructured_poisson_3d) that v1's 7-bit field could not represent.
4. **block=4 packing** (HybridDiaWell, sparse/hybrid.py): after the
   dominant diagonals of an RCM'd FEM matrix are split out to DIA
   slice-FMA streams, remaining rows hold ~4-5 entries — 8-slot blocks
   would waste half the stream, so the hybrid remainder packs 4-slot
   blocks (32 per vreg-row).

Hardware A/B at 1M 2-D (v5e, 400-rep chains): v1 634.6 us → v2
435.1 us; rejected variants of record: per-tile pl.when group bounds
with transposed stage A (532 us — scalar branches cost more than the
masked work they skip at NG=10), VPU roll-tree reduce (521 us),
Precision.HIGH reduce (unsupported by Mosaic).

Third-generation layout (round 4, MEASURED.md "v3"): when every row
fits 1 + MAX_OV_ROUNDS blocks (any hybrid remainder), the
**identity-route** layout puts each row's primary block AT its own
reduce column (no route gather) and grants overflow from
**heterogeneous tail units** — full/half/quarter lane groups defined
by a static piecewise reduce selector — each folded by its own ~free
merge round.  Spills keep their empty slot under the reserved gather
pass 3 and read a per-TILE **extras table** (σ stored in the bits the
3-pass cap frees, at table positions like rho); the last few hundred
strays are patched into the reduce output by a grid-1 Pallas kernel.
Rationale: XLA gather/scatter costs a fixed ~85 us PER OP here, so
extras must never touch the XLA path.  Hybrid e2e at 1M: 531 → 400 us
(18.3 Gnnz/s), slots x1.43 → x1.25.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
TABLE_ROWS = 8
MAX_PASSES = 4
MAX_OV_ROUNDS = 4  # idroute: overflow blocks (= merge rounds) per row


class WellUnsupported(ValueError):
    """Matrix shape/structure outside what the WELL kernel handles."""


def _unit_split(tail: int, block: int):
    """Tail-lane split into (full, half, quarter) overflow units.
    Quarter units (1 lane at block=4) stop needs-1 rows from burning a
    bigger grant — the dominant overflow class on hybrid remainders."""
    half = block // 2
    quart = max(block // 4, 1)
    p4 = tail // (3 * block)
    rem = tail - p4 * block
    p2 = rem // (3 * half)
    p1 = (rem - p2 * half) // quart
    return p4, p2, p1


def _unit_split_capped(tail: int, block: int, g: int):
    """Split with the quarter count capped so every reduce column id
    fits the 6-bit rts merge field (g + p4 + p2 + p1 <= 64)."""
    p4, p2, p1 = _unit_split(tail, block)
    p1 = max(min(p1, 64 - g - p4 - p2), 0)
    return p4, p2, p1


def _unit_split_demand(tail: int, block: int, g: int, nnz_row, n_groups):
    """Demand-proportional unit split: allocate full/half/quarter tail
    units from the actual per-row overflow distribution instead of the
    fixed thirds heuristic.  The thirds split is tuned for block-4
    hybrid remainders (~1 slot of overflow per needy row); on block-8
    dense rows (3-D Galerkin levels at 12-40 nnz/row) it grants 2 full
    units per group where the demand is ~5, so every g-candidate fails
    the spill test and the layout degenerates (measured x10.11 slots at
    g=1 on the 1M 3-D fine level)."""
    half = block // 2
    quart = max(block // 4, 1)
    need = np.clip(np.asarray(nnz_row) - block, 0, MAX_OV_ROUNDS * block)
    nf = need // block
    rem = need - nf * block
    nh = rem // half
    rem2 = rem - nh * half
    nq = -(-rem2 // quart)
    gf = nf.sum() / max(n_groups, 1)
    gh = nh.sum() / max(n_groups, 1)
    gq = nq.sum() / max(n_groups, 1)
    # 20% headroom + 1 absorbs per-group variance; grant full units
    # first (a starved full-unit class cannot be patched by quarters
    # within the MAX_OV_ROUNDS budget)
    p4 = max(min(int(np.ceil(gf * 1.2 + 1)), tail // block, 64 - g), 0)
    rem_t = tail - p4 * block
    p2 = max(
        min(int(np.ceil(gh * 1.2 + 1)), rem_t // half, 64 - g - p4), 0
    )
    rem_t -= p2 * half
    p1 = max(min(rem_t // quart, 64 - g - p4 - p2), 0)
    return p4, p2, p1


def _grant_units(nnz_row, grp_ids, n_groups, g, block, p4, p2, p1):
    """Flexible per-row overflow-unit grants for the identity-route
    layout: each row takes the largest-fitting units first and falls
    back to smaller (or larger) classes as the group's budgets run
    out, so per-group demand variance is absorbed by total SLOT
    capacity instead of per-class unit counts.  Lockstep loop over the
    g rows of every group simultaneously (vectorized across groups).

    Returns per-row per-class (granted, upos) + row_cap, merge_rounds.
    """
    n = len(nnz_row)
    sizes = (block, block // 2, max(block // 4, 1))
    budgets = (p4, p2, p1)
    needs_all = np.clip(nnz_row - block, 0, MAX_OV_ROUNDS * block)
    rem = [np.full(n_groups, b, dtype=np.int64) for b in budgets]
    granted = [np.zeros(n, dtype=np.int64) for _ in sizes]
    upos = [np.zeros(n, dtype=np.int64) for _ in sizes]
    for j in range(g):
        rows = np.arange(j, n, g)
        gi = grp_ids[rows]
        need = needs_all[rows]
        rounds_left = np.full(len(rows), MAX_OV_ROUNDS, dtype=np.int64)
        for c, sz in enumerate(sizes):
            # units of this class: enough to cover the remaining need
            # unless a smaller class exists to take the remainder
            if c < len(sizes) - 1:
                want = need // sz
            else:
                want = -(-need // sz)
            t = np.minimum(
                np.minimum(want, rem[c][gi]), rounds_left
            )
            upos[c][rows] = budgets[c] - rem[c][gi]
            rem[c][gi] -= t
            granted[c][rows] = t
            need = np.maximum(need - sz * t, 0)
            rounds_left = rounds_left - t
        # second chance: cover leftovers with whatever units remain in
        # any class (e.g. quarters exhausted but halves free) — the
        # row's units in a class stay contiguous because no other row
        # touched the budgets since its first-pass take
        for c, sz in enumerate(sizes):
            more = np.minimum(
                np.minimum(-(-need // sz), rem[c][gi]), rounds_left
            )
            more = np.where(need > 0, more, 0)
            rem[c][gi] -= more
            granted[c][rows] += more
            need = np.maximum(need - sz * more, 0)
            rounds_left = rounds_left - more
    row_cap = block + sum(
        sz * granted[c] for c, sz in enumerate(sizes)
    )
    merge_rounds = int(sum(granted).max(initial=0))
    return granted, upos, row_cap, merge_rounds


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

    Array shapes (T = tiles, F = vregs/tile, M = F*8, B = 128/block):
      q     (T,)          int32  tile window start row into x2d
                                 (blocked/dma x modes)
      qv    (T*F,)        int32  per-vreg 8-aligned window start row
      data  (T, M, 128)   dtype  entry values (0 in padded slots)
      w     (T, M, 128)   int32  packed index word, read in two domains:
                                   slot domain  — bits 0-6  λ table lane
                                                  bits 7-8  gather pass
                                   table domain — bits 9+3p..11+3p table
                                                  row for pass p (p < 4)
                                                  bits 21-30 window row
                                                  of table slot
      rts   (T, M, B)     int32  narrow route/merge sidecar:
                                   bits 0-4 output route (row's first
                                            block lane, read at lane j =
                                            row-in-group)
                                   bits 5+k merge flag round k (read at
                                            the block lane)
      gt    (T,)          int32  per-tile max group count (diagnostics)
      pt    (T,)          int32  per-tile max pass count (diagnostics)
    """

    q: jax.Array
    qv: jax.Array
    # per-vreg group count (diagnostics; the kernel's stage-A loop is
    # static — a dynamic per-vreg fori_loop trip count measured ~20+
    # cycles/iteration of Mosaic loop overhead, round 5)
    ngv: jax.Array
    gt: jax.Array
    pt: jax.Array
    data: jax.Array
    w: jax.Array
    rts: jax.Array
    extra_rows: jax.Array  # UNIQUE spill rows, sorted
    extra_seg: jax.Array  # per spilled entry: index into extra_rows
    extra_cols: jax.Array
    extra_vals: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))
    win_rows: int = dataclasses.field(metadata=dict(static=True))
    x2d_rows: int = dataclasses.field(metadata=dict(static=True))
    rows_per_vrow: int = dataclasses.field(metadata=dict(static=True))
    vregs_per_tile: int = dataclasses.field(metadata=dict(static=True))
    n_groups: int = dataclasses.field(metadata=dict(static=True))
    n_passes: int = dataclasses.field(metadata=dict(static=True))
    merge_rounds: int = dataclasses.field(metadata=dict(static=True))
    # in-kernel extras (idroute only): spilled entries keep their slot
    # with the reserved pass id 3 and gather x from a per-TILE extras
    # table — XLA gather/scatter of even a few spills costs a fixed
    # ~85 us PER OP on this hardware (see the builder's extras section)
    #   ex_tw (T, 8, 128) int32: eta(3) | grp(5)<<3 at table positions
    #   ex_q  (T,)        int32: per-tile 8-aligned extras window base
    ex_tw: jax.Array = None
    ex_q: jax.Array = None
    n_ex_groups: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # identity-route layout: primary block at the row's own lane,
    # overflow in heterogeneous tail units (full + half), each folded
    # by its own merge round; no route gather.  ``bcols`` is the reduce
    # output width g + p4 + p2 (0 = legacy 128/block)
    idroute: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    bcols: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # compact output layout (idroute only): the kernel compacts the
    # (M, bcols) reduce result to row-major (M*g/128, 128) chunks
    # on-chip (static two-step gathers), so y = out.ravel()[:n] is a
    # free view instead of the measured ~70 us XLA slice+relayout of
    # the padded block layout (MEASURED.md round-4 glue budget).
    # Requires (vregs*8*g) % 1024 == 0 (the g-selection loop enforces
    # it when compact is requested).
    compact: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # sparse window groups (round 5): per-vreg per-tile SMEM list of
    # the USED 8-row x2d window groups; stage A gathers only those.
    # Removes the 1024-row contiguous-window cap (wide-band matrices:
    # 1M 3-D elasticity, smoothed-SA restrictions) and cuts stage A to
    # actual usage.  gmap is (T, F*ngs) int32; None = dense windows.
    gmap: jax.Array = None
    sparse_groups: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # identity-route tail-unit split of record (-1 = derive the legacy
    # thirds split from (tail, block, g)); the kernel's static reduce
    # selector must see exactly the split the layout was built with
    up4: int = dataclasses.field(default=-1, metadata=dict(static=True))
    up2: int = dataclasses.field(default=-1, metadata=dict(static=True))
    up1: int = dataclasses.field(default=-1, metadata=dict(static=True))
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
    def blocks_per_vrow(self) -> int:
        return LANES // self.block

    @property
    def out_cols(self) -> int:
        """Reduce output width (kernel out/rts minor dim)."""
        return self.bcols or self.blocks_per_vrow

    @property
    def n_extras(self) -> int:
        return int(self.extra_cols.shape[0])

    def mv(self, x: jax.Array) -> jax.Array:
        from tpu_amg.ops.well_pallas import well_spmv

        return well_spmv(self, x)

    def astype_values(self, dtype) -> "WELL":
        """Convert ONLY the value stream (bf16 values cut the dominant
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

    def mm(self, xs: jax.Array) -> jax.Array:
        return self.__call__(xs)

    def __repr__(self):
        slots = int(np.prod(self.data.shape))
        return (
            f"WELL(shape={self.shape}, nnz={self.nnz}, slots={slots} "
            f"(x{slots / max(self.nnz, 1):.2f}), block={self.block}, "
            f"groups={self.n_groups}, passes={self.n_passes}, "
            f"extras={self.n_extras}, compact={self.compact}, "
            f"sg={self.sparse_groups}, dtype={self.dtype})"
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_csr(
        csr,
        dtype=jnp.float32,
        vregs_per_tile: int | None = None,
        block: int = 8,
        max_passes: int = MAX_PASSES,
        max_span_rows: int = 1024,
        max_spill_frac: float = 0.02,
        rows_per_vrow: int | None = None,
        idroute: bool | None = None,
        inkernel_extras: bool = True,
        compact: bool | None = None,
        unit_split: tuple | None = None,
        sparse_groups: bool | None = None,
    ) -> "WELL":
        """Build from host CSR.  Raises WellUnsupported when the matrix
        is not band-structured enough (callers fall back to ELL).

        ``block`` is the lane-block granularity (8 default; 4 packs
        sparse remainders after a hybrid diagonal split ~40% tighter).
        ``rows_per_vrow`` forces the row-packing factor — HaloWELL
        shards must agree on it across devices.
        """
        if vregs_per_tile is None:
            err = None
            for vpt in (32, 16, 8):
                try:
                    return WELL.from_csr(
                        csr, dtype=dtype, vregs_per_tile=vpt, block=block,
                        max_passes=max_passes, max_span_rows=max_span_rows,
                        max_spill_frac=max_spill_frac,
                        rows_per_vrow=rows_per_vrow, idroute=idroute,
                        inkernel_extras=inkernel_extras, compact=compact,
                        unit_split=unit_split,
                        sparse_groups=sparse_groups,
                    )
                except WellUnsupported as e:
                    err = e
            # spill-bound failures: the g cost scan prices slot/stream
            # budgets but cannot foresee per-lane TABLE/pass pressure —
            # block-structured matrices (elasticity: columns arrive in
            # block_size-consecutive runs) overflow the 8-deep lane
            # stacks at shared g (measured: the 1M elasticity remainder
            # spilled 15.5% at g=2 and fit at g=1).  Step g down before
            # giving up.
            if rows_per_vrow is None:
                for g_try in (2, 1):
                    try:
                        return WELL.from_csr(
                            csr, dtype=dtype, vregs_per_tile=32,
                            block=block, max_passes=max_passes,
                            max_span_rows=max_span_rows,
                            max_spill_frac=max_spill_frac,
                            rows_per_vrow=g_try, idroute=idroute,
                            inkernel_extras=inkernel_extras,
                            compact=compact, unit_split=unit_split,
                            sparse_groups=sparse_groups,
                        )
                    except WellUnsupported as e:
                        err = e
            raise err
        assert block in (4, 8, 16) and max_passes <= MAX_PASSES
        bpv = LANES // block  # blocks per vreg-row
        n, ncols = csr.shape
        indptr = np.asarray(csr.indptr, dtype=np.int64)
        indices = np.asarray(csr.indices, dtype=np.int64)
        vals = np.asarray(csr.data, dtype=np.float64)
        nnz = len(indices)
        if nnz == 0 or n == 0:
            raise WellUnsupported("empty matrix")

        nnz_row = np.diff(indptr)
        rows_of = np.repeat(np.arange(n, dtype=np.int64), nnz_row)
        nb_full = np.maximum((nnz_row + block - 1) // block, 1)

        # ---- identity-route mode: when capping every row at 2 blocks
        # (primary + one overflow) spills almost nothing, lay rows out
        # with the primary block AT the row's own lane — the reduce then
        # needs no route gather and exactly one merge round (~4 VPU ops
        # per block-elem instead of ~13; the round-4 reduce attribution
        # showed the dynamic-lane merge/route chain dominating the
        # block=4 kernel) -----------------------------------------------
        idroute_forced = idroute is not None
        if idroute is None:
            over_cap = np.maximum(
                nnz_row - (1 + MAX_OV_ROUNDS) * block, 0
            ).sum()
            idroute = bool(over_cap <= 0.25 * max_spill_frac * nnz)
        idroute = bool(idroute)

        # stage-A work estimate for the g cost model: the kernel spends
        # ~0.6 bytes-of-stream-equivalent per slot per window group
        # (one masked sublane gather per 8 window rows per vreg), and a
        # 3-D RCM band reaches ~110 groups — an op bill ~9x the 8 B
        # slot stream that the g choice must price in
        if nnz:
            off_sc = np.abs(
                indices - (rows_of * np.int64(ncols)) // max(n, 1)
            )
            bw_est = 2.0 * float(np.percentile(off_sc, 99))
        else:
            bw_est = 0.0
        ng_est = min(bw_est / (8 * LANES) + 1.0, 128.0)
        vpu_per_slot = 0.59 * (ng_est + 16.0)

        # ---- choose rows_per_vrow: largest g whose per-group block
        # demand fits the bpv budget with tiny spill ------------------
        # compact output (see the ``compact`` field) needs the per-tile
        # out-slot count (8*vregs*g) to be a whole number of (8, 128)
        # output vregs; restrict g to multiples of ``align`` when it is
        # requested (auto for idroute), falling back to a free g (and
        # the XLA extract) when no aligned g passes the spill test
        # default OFF: hardware A/B at 1M 2-D (tools/compactbench.py)
        # measured compact 420.8 us vs legacy 400.7 — the g-alignment
        # constraint inflated slots x1.25 -> x1.43 (g 23 -> 20) and the
        # chained-scan protocol overlaps most of the XLA extract the
        # compaction removes.  Kept as an opt-in for layouts whose g is
        # naturally aligned.
        align = max(1024 // (TABLE_ROWS * vregs_per_tile), 1)
        want_compact = bool(compact) if compact is not None else False
        use_compact = False
        g_split = tuple(unit_split) if unit_split is not None else None
        if rows_per_vrow is not None:
            g = int(rows_per_vrow)
            use_compact = bool(
                want_compact and idroute and g % align == 0
            )
        else:
            g = None
            attempts = []
            if want_compact and idroute:
                attempts.append(
                    (True, [c for c in range(bpv, 0, -1) if c % align == 0])
                )
            if compact is not True:
                attempts.append((False, list(range(bpv, 0, -1))))
            for _compact_try, _cands in attempts:
                use_compact = _compact_try
                for cand in _cands:
                    n_groups = -(-n // cand)
                    pad_rows = n_groups * cand - n
                    if idroute:
                        # COST-based g choice: slot-stream bytes
                        # (128/g slots per row) vs the spill bill —
                        # strays ride the on-chip patch kernel (~10 VPU
                        # ops ≈ 6 KB-of-stream each), overflow beyond
                        # the stray cap rides the in-kernel extras
                        # table / XLA path (~170 us ≈ 100 MB-of-stream,
                        # fixed).  A fixed absolute stray budget here
                        # (round 4: 1536) made every good g fail at
                        # 13M-nnz scale — over grows with n — and the
                        # layout degenerated to g=1 (x10.11 slots
                        # measured on the 1M 3-D fine level).
                        tail_c = LANES - block * cand
                        if tail_c < 0:
                            continue
                        if unit_split is not None:
                            cand_splits = [tuple(unit_split)]
                        else:
                            cand_splits = list(dict.fromkeys([
                                _unit_split_capped(tail_c, block, cand),
                                _unit_split_demand(
                                    tail_c, block, cand, nnz_row,
                                    n_groups,
                                ),
                            ]))
                        gids_c = np.arange(n) // cand
                        needs_c = np.clip(
                            nnz_row - block, 0, MAX_OV_ROUNDS * block
                        )
                        over = None
                        for sp in cand_splits:
                            _, _, cap_c, _ = _grant_units(
                                nnz_row, gids_c, n_groups, cand, block,
                                *sp,
                            )
                            over_c = np.maximum(
                                block + needs_c - cap_c, 0
                            ).sum()
                            if over is None or over_c < over:
                                over, sp_best = over_c, sp
                        if over > max(max_spill_frac * nnz, 4096):
                            continue  # would fail the build spill cap
                        # spills are expensive however they ride: the
                        # stray patch kernel is ~10 VPU ops/entry and
                        # the XLA gather+scatter path ~10 ns/entry —
                        # both ≈ 6 KB-of-stream equivalent (round-5
                        # hardware: a g choice carrying 140k no-slot
                        # spills cost the 1M 3-D fine SpMV ~1.4 ms on
                        # the XLA path, far above its 15 MB slot saving)
                        cost_c = (
                            n_groups * LANES * (8.0 + vpu_per_slot)
                            + over * 6000.0
                            # spills beyond the stray-patch cap pay the
                            # XLA gather/scatter pair's fixed overhead
                            # on top of the per-entry cost
                            + (1e8 if over > 4096 else 0.0)
                        )
                        if g is None or cost_c < g_cost:
                            g, g_cost, g_split = cand, cost_c, sp_best
                        continue
                    else:
                        # legacy layout: same cost-argmin as idroute —
                        # the round-4 first-fit rejected every sharing
                        # g on variance (0.5% budget) and fell to g=1
                        # (x3.07 slots measured on the 1M elasticity
                        # fine level)
                        demand = np.concatenate([
                            np.minimum(nb_full, bpv),
                            np.zeros(pad_rows, np.int64),
                        ])
                        gsum = demand.reshape(n_groups, cand).sum(axis=1)
                        over = np.maximum(gsum - bpv, 0).sum() * block
                        if over > max_spill_frac * nnz:
                            continue
                        cost_c = (
                            n_groups * LANES * (8.0 + vpu_per_slot)
                            + over * 6000.0
                            + (1e8 if over > 0 else 0.0)
                        )
                        if g is None or cost_c < g_cost:
                            g, g_cost = cand, cost_c
                        continue
                if g is not None:
                    break
            if (
                g is not None and idroute and unit_split is None
                and not idroute_forced
            ):
                # compare the best identity-route candidate against a
                # quick LEGACY-layout estimate: dense-row matrices can
                # pack tighter with shared multi-block rows than with
                # per-row overflow units (the 0.8 hysteresis keeps
                # idroute — cheaper reduce, in-kernel extras — on ties)
                for cand in range(min(bpv, 16), 0, -1):
                    n_groups_l = -(-n // cand)
                    pad_l = n_groups_l * cand - n
                    demand = np.concatenate([
                        np.minimum(nb_full, min(bpv, 16)),
                        np.zeros(pad_l, np.int64),
                    ])
                    gsum = demand.reshape(n_groups_l, cand).sum(axis=1)
                    over_l = np.maximum(gsum - bpv, 0).sum() * block
                    if over_l <= max(max_spill_frac * nnz / 4, 0.0):
                        cost_l = (
                            n_groups_l * LANES * (8.0 + vpu_per_slot)
                            + over_l * 6000.0
                        )
                        if cost_l < 0.8 * g_cost:
                            return WELL.from_csr(
                                csr, dtype=dtype,
                                vregs_per_tile=vregs_per_tile,
                                block=block, max_passes=max_passes,
                                max_span_rows=max_span_rows,
                                max_spill_frac=max_spill_frac,
                                rows_per_vrow=None, idroute=False,
                                inkernel_extras=inkernel_extras,
                                compact=False,
                                sparse_groups=sparse_groups,
                            )
                        break
            if g is None:
                use_compact = False
                if idroute:
                    # no g packs every row's overflow — fall back to
                    # the generic merge/route layout
                    return WELL.from_csr(
                        csr, dtype=dtype,
                        vregs_per_tile=vregs_per_tile, block=block,
                        max_passes=max_passes,
                        max_span_rows=max_span_rows,
                        max_spill_frac=max_spill_frac,
                        rows_per_vrow=rows_per_vrow, idroute=False,
                        inkernel_extras=inkernel_extras,
                        sparse_groups=sparse_groups,
                    )
                raise WellUnsupported(
                    "row density too irregular for WELL"
                )
        v_rows = TABLE_ROWS * g  # rows per slot-vreg

        # ---- per-row block allowance within each group budget -------
        group_of = rows_of // g  # group id per entry (== global vreg-row)
        n_groups_rows = -(-n // g)
        grp_ids = np.arange(n) // g
        j_in_grp = np.arange(n) % g
        if idroute:
            if g > bpv:
                raise WellUnsupported(
                    f"rows_per_vrow {g} > {bpv} blocks in identity-route "
                    "layout"
                )
            # primary block at the row's own lane j; overflow in
            # HETEROGENEOUS tail units — p4 full (``block``-lane) and
            # p2 half units share the tail, so a row needing 1-2 extra
            # slots takes a half unit instead of wasting a full block.
            # With a 4-lane grant quantum the 1M hybrid remainder
            # denied ~6.9k entries to group-budget overflow (any legacy
            # spill costs a fixed ~160 us in XLA); half units raise the
            # per-group unit capacity past ~4 sigma of the demand.
            # Each granted unit is folded by its own merge round — the
            # tile-batched merge measured ~free on hardware (283.8 us
            # full vs 284.0 no-merge at 1M).
            half = block // 2
            quart = max(block // 4, 1)
            tail = LANES - block * g
            if g_split is not None:
                p4, p2, p1 = g_split
            else:
                # forced rows_per_vrow: evaluate both split heuristics
                # against the actual demand and take the tighter one
                best = None
                for sp in dict.fromkeys([
                    _unit_split_capped(tail, block, g),
                    _unit_split_demand(
                        tail, block, g, nnz_row, n_groups_rows
                    ),
                ]):
                    _, _, cap_s, _ = _grant_units(
                        nnz_row, grp_ids, n_groups_rows, g, block, *sp
                    )
                    over_s = np.maximum(
                        np.minimum(nnz_row, block + MAX_OV_ROUNDS * block)
                        - cap_s, 0,
                    ).sum()
                    if best is None or over_s < best[0]:
                        best = (over_s, sp)
                p4, p2, p1 = best[1]
            bcols = g + p4 + p2 + p1
            granted, upos, row_cap, merge_rounds = _grant_units(
                nnz_row, grp_ids, n_groups_rows, g, block, p4, p2, p1
            )
            b0 = j_in_grp
        else:
            # over-budget rows spill; 16-block cap bounds merge_rounds
            # at 4
            nb = np.minimum(nb_full, min(bpv, 16))
            gsum = np.zeros(n_groups_rows, dtype=np.int64)
            np.add.at(gsum, grp_ids, nb)
            for gi in np.flatnonzero(gsum > bpv):
                rows = np.arange(gi * g, min((gi + 1) * g, n))
                while nb[rows].sum() > bpv:
                    r = rows[np.argmax(nb[rows])]
                    nb[r] -= 1
            nb_pad = np.zeros(n_groups_rows * g, dtype=np.int64)
            nb_pad[:n] = nb
            b0_pad = nb_pad.reshape(n_groups_rows, g).cumsum(
                axis=1
            ) - nb_pad.reshape(n_groups_rows, g)
            b0 = b0_pad.reshape(-1)[:n]
            merge_rounds = (
                int(np.ceil(np.log2(max(nb.max(), 1))))
                if nb.max() > 1
                else 0
            )
            assert merge_rounds <= 4

        # ---- entry slots ---------------------------------------------
        k_in_row = np.arange(nnz) - np.repeat(indptr[:-1], nnz_row)
        if idroute:
            r = rows_of
            keep = k_in_row < row_cap[r]
            # slot order per row: primary block, then full / half /
            # quarter tail units
            lane_p = b0[r] * block + k_in_row
            idx = k_in_row - block
            off0 = block * granted[0][r]
            off1 = off0 + half * granted[1][r]
            lane_f = (
                g + upos[0][r] + np.maximum(idx, 0) // block
            ) * block + idx % block
            i1 = np.maximum(idx - off0, 0)
            lane_h = (
                (g + p4) * block
                + (upos[1][r] + i1 // half) * half
                + i1 % half
            )
            i2 = np.maximum(idx - off1, 0)
            lane_q = (
                (g + p4) * block
                + p2 * half
                + (upos[2][r] + i2 // quart) * quart
                + i2 % quart
            )
            lane = np.where(
                k_in_row < block,
                lane_p,
                np.where(
                    idx < off0,
                    lane_f,
                    np.where(idx < off1, lane_h, lane_q),
                ),
            )
        else:
            keep = k_in_row < nb[rows_of] * block
            lane = (
                b0[rows_of] + k_in_row // block
            ) * block + k_in_row % block
        vm = group_of  # global vreg-row id
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

        # ---- per-vreg windows ----------------------------------------
        # SPARSE WINDOW GROUPS (round 5): when the whole x2d fits the
        # kernel's resident-VMEM budget, each vreg carries an explicit
        # per-tile SMEM list of the 8-row window groups it actually
        # touches, and stage A gathers only those.  This (a) removes the
        # 1024-row contiguous-window cap entirely — wide-band matrices
        # (1M 3-D elasticity: ~±150k-column bands; smoothed-SA
        # restrictions: hub supports) previously spilled 15%+ and fell
        # off the fast path — and (b) cuts stage A to USED groups (the
        # elasticity fine level touches ~20-40 groups per vreg across a
        # 1500-row span).  Dense contiguous windows remain for blocked-x
        # (huge shards) and halo builds.
        import os as _os

        lim = -(-ncols // LANES)
        lim8 = -(-lim // 8) * 8
        cap_mb = float(
            _os.environ.get("TPU_AMG_WELL_RESIDENT_MB", "8")
        )
        ngs_cap = 120  # amap grp field: 7 bits (<< 3 | eta <= 1023)
        use_sparse_groups = (
            sparse_groups
            if sparse_groups is not None
            else lim8 * LANES * 4 <= cap_mb * 1e6
        )
        if use_sparse_groups:
            ag = pc // np.int64(8 * LANES)
            vg_key = pv * np.int64(1 << 24) + ag
            assert lim8 // 8 < (1 << 24)
            uvg, vg_inv = _sorted_unique_inverse(vg_key)
            g_pv = uvg >> 24
            g_ag = uvg & np.int64((1 << 24) - 1)
            cnt = np.bincount(vg_inv, minlength=len(uvg))
            used_per_v = np.bincount(g_pv, minlength=nv_pad)
            ngs = int(min(max(int(used_per_v.max(initial=1)), 1), ngs_cap))
            drop_g = np.zeros(len(uvg), dtype=bool)
            for vv in np.flatnonzero(used_per_v > ngs):
                s0 = np.searchsorted(g_pv, vv)
                s1 = np.searchsorted(g_pv, vv, side="right")
                idxs = np.arange(s0, s1)
                keep_k = idxs[
                    np.argsort(-cnt[idxs], kind="stable")[:ngs]
                ]
                dd = np.ones(s1 - s0, dtype=bool)
                dd[keep_k - s0] = False
                drop_g[idxs] = dd
            kept_g = ~drop_g
            kk = kept_g.astype(np.int64)
            csum = np.cumsum(kk) - kk
            newv = np.concatenate([[True], g_pv[1:] != g_pv[:-1]])
            vstart = np.maximum.accumulate(
                np.where(newv, np.arange(len(uvg)), 0)
            )
            base_v = csum[vstart]
            ordv = csum - base_v
            pair_ok &= kept_g[vg_inv]
            gmap_np = np.zeros((nv_pad, ngs), dtype=np.int64)
            gsel = np.flatnonzero(kept_g)
            gmap_np[g_pv[gsel], ordv[gsel]] = g_ag[gsel]
            ng_v = np.minimum(used_per_v, ngs)
            NG = int(max(ng_v.max(initial=1), 1))
            hi_pair = ordv[vg_inv] * 8 + (pc // LANES) % 8
            qv = np.zeros(nv_pad, dtype=np.int64)
            q_t = np.zeros(t_count, dtype=np.int64)
            win_rows = 8
            x2d_rows = int(lim8)

            # entries through dropped pairs spill
            keep_idx = np.flatnonzero(keep)
            e_ok = pair_ok[pair_inv]
            keep[keep_idx[~e_ok]] = False
            kept_pairs = pair_inv[e_ok]
            ke = keep_idx[e_ok]

            amap = np.zeros((nv_pad, TABLE_ROWS, LANES), dtype=np.int64)
            okp = np.flatnonzero(pair_ok)
            amap[pv[okp], stack[okp], plam[okp]] = hi_pair[okp]
        else:
            gmap_np = None
            ngs = 0
            vmin = np.full(nv_pad, np.int64(ncols), dtype=np.int64)
            vmax = np.zeros(nv_pad, dtype=np.int64)
            np.minimum.at(vmin, pv, pc)
            np.maximum.at(vmax, pv, pc)
            has_pairs = vmax >= vmin
            qv = np.where(has_pairs, (vmin // LANES) & ~np.int64(7), 0)
            span = np.where(has_pairs, vmax // LANES - qv + 1, 1)
            # clamp windows inside ceil8(ncols/128) x2d rows: an 8-aligned
            # window whose end pokes past the matrix width forces x2d_rows >
            # ceil(ncols/128), and the resulting jnp.pad of x copies the
            # ENTIRE vector (~10 us of the 1M mv glue, MEASURED.md round-4
            # budget).  Shifting a window down keeps coverage (length is
            # unchanged, vmax//128 < lim) and 8-alignment (lim8 and 8*ng
            # are both multiples of 8).
            lim8 = -(-(-(-ncols // LANES)) // 8) * 8
            ng_pre = (span + 7) // 8
            qv = np.minimum(qv, np.maximum(lim8 - 8 * ng_pre, 0))
            span = np.where(has_pairs, vmax // LANES - qv + 1, 1)
            cap_hard = min(max_span_rows, 1024)
            # soft span cap: the kernel's stage-A loop length is the GLOBAL
            # max group count — boundary outlier vregs (3-D RCM bands: mean
            # span ~24 groups, outliers ~118) would make EVERY vreg pay
            # their stage-A program length (~2 ms of gathers over empty
            # groups at 1M 3-D).  Choose the tightest cap near the typical
            # span whose spilled entries fit the extras budget; spilled
            # pairs ride the in-kernel extras table / XLA path.
            cap = cap_hard
            if has_pairs.any():
                # the kernel's stage-A loop pays max(ng) for EVERY vreg
                # (~0.6 KB-of-stream-equivalent per vreg per group), so
                # truncating outlier windows is worth spilled entries
                # (~6 KB each) — but ONLY when the span distribution has a
                # tail to cut: a q50 cap on the 1M 3-D fine level (tight
                # bandwidth-driven spans, median ≈ max) spilled 120k extra
                # entries for zero NG reduction (round-5 hardware).
                # Evaluate each candidate's (stage-A + spill) cost and keep
                # the argmin; cap_hard (no spill) is always a candidate.
                spill_budget = max(0.015 * nnz, 4096)
                span_max = int(span.max())
                nv_real = int(has_pairs.sum())
                quants = [
                    float(np.percentile(span[has_pairs], q))
                    for q in (50, 75, 90, 97, 99.5)
                ]
                cand_caps = sorted(dict.fromkeys(
                    [
                        int(min(cap_hard, max(8 * -(-int(qv_) // 8), 16)))
                        for qv_ in quants
                    ]
                    + [min(cap_hard, -(-span_max // 8) * 8)]
                ))
                best_cost = None
                for cand_cap in cand_caps:
                    over_c = np.flatnonzero(span > cand_cap)
                    if len(over_c) == 0:
                        n_sp = 0
                    else:
                        starts_c = np.searchsorted(pv, over_c)
                        ends_c = np.searchsorted(pv, over_c, side="right")
                        med_c = pc[
                            np.minimum((starts_c + ends_c) // 2, len(pc) - 1)
                        ]
                        cap8_c = -(-cand_cap // 8) * 8
                        qv_c = np.clip(
                            (med_c // LANES - cand_cap // 2) & ~np.int64(7),
                            0, max(lim8 - cap8_c, 0),
                        )
                        qq = np.full(nv_pad, np.int64(-1))
                        qq[over_c] = qv_c
                        relc = pc // LANES - qq[pv]
                        badp = (
                            (qq[pv] >= 0)
                            & ((relc < 0) | (relc >= cand_cap))
                        )
                        n_sp = int(badp[pair_inv].sum())
                    if n_sp > spill_budget:
                        continue
                    ng_eff = -(-min(span_max, cand_cap) // 8)
                    cost_c = nv_real * ng_eff * 600.0 + n_sp * 6000.0
                    if best_cost is None or cost_c < best_cost:
                        best_cost, cap = cost_c, cand_cap
            over_v = np.flatnonzero(span > cap)
            if len(over_v):
                # boundary outlier vregs (e.g. smoothed-SA restriction rows
                # whose aggregate support jumps the RCM band): place a
                # median-centered cap-sized window and SPILL the pairs
                # outside it instead of rejecting the whole matrix —
                # round-4 behavior killed the 1M 3-D restriction build on
                # one 459904-column vreg while its mean span was ~3% of
                # that.  upairs are sorted by (vreg, col), so each vreg's
                # pairs form a contiguous run and the run middle is its
                # median column.
                starts = np.searchsorted(pv, over_v)
                ends = np.searchsorted(pv, over_v, side="right")
                med = pc[np.minimum((starts + ends) // 2, len(pc) - 1)]
                cap8 = -(-cap // 8) * 8
                qv[over_v] = np.clip(
                    (med // LANES - cap // 2) & ~np.int64(7),
                    0, max(lim8 - cap8, 0),
                )
                span[over_v] = min(cap, lim8)
                rel_p = pc // LANES - qv[pv]
                pair_ok &= (rel_p >= 0) & (rel_p < cap)
            # reject truly unbanded matrices: stage A cost is linear in the
            # vreg span, so a span comparable to the full matrix width means
            # the windowed gather degenerates (the absolute 1024-row cap
            # alone admits any matrix below ~131k columns)
            col_span = (vmax - vmin + 1)[has_pairs]
            mean_span = float(col_span.mean()) if has_pairs.any() else 0.0
            if mean_span > 0.35 * ncols and ncols > 16 * LANES:
                raise WellUnsupported(
                    f"mean vreg column span {mean_span:.0f} is "
                    f"{mean_span / ncols:.0%} of the matrix width; "
                    "not band-structured (RCM it)"
                )
            ng_v = (span + 7) // 8
            NG = int(ng_v.max())

            # entries through dropped pairs spill
            keep_idx = np.flatnonzero(keep)
            e_ok = pair_ok[pair_inv]
            keep[keep_idx[~e_ok]] = False
            kept_pairs = pair_inv[e_ok]
            ke = keep_idx[e_ok]  # kept entry indices into the raw COO

            # tile window (blocked/dma x modes) + x2d extent
            q_t = qv.reshape(t_count, f).min(axis=1)
            win_end = (qv + 8 * ng_v).reshape(t_count, f).max(axis=1)
            win_rows = int((win_end - q_t).max())
            win_rows = -(-win_rows // 8) * 8
            x2d_rows = int((qv + 8 * ng_v).max())
            x2d_rows = max(x2d_rows, -(-ncols // LANES))
            x2d_rows = -(-x2d_rows // 8) * 8

            # ---- amap (window row of table slot, relative to qv) ---------
            amap = np.zeros((nv_pad, TABLE_ROWS, LANES), dtype=np.int64)
            ok = np.flatnonzero(pair_ok)
            hi = pc[ok] // LANES - qv[pv[ok]]
            amap[pv[ok], stack[ok], plam[ok]] = hi

        # ---- pass ids + rho -------------------------------------------
        vm_k = vm[ke]  # global vreg-row per kept entry
        lam_k = plam[kept_pairs].astype(np.int64)
        stk_k = stack[kept_pairs]
        trip = (vm_k * LANES + lam_k) * TABLE_ROWS + stk_k
        utrip, trip_inv = _sorted_unique_inverse(trip)
        tvl = utrip // TABLE_ROWS
        newg = np.concatenate([[True], tvl[1:] != tvl[:-1]])
        gstart = np.maximum.accumulate(
            np.where(newg, np.arange(len(utrip)), 0)
        )
        passid_u = np.arange(len(utrip)) - gstart
        pass_k = passid_u[trip_inv]
        mp = min(max_passes, 3) if idroute else max_passes
        n_passes = int(min(pass_k.max(initial=0) + 1, mp))

        over_pass = pass_k >= mp
        if over_pass.any():
            keep[ke[over_pass]] = False
            sel = ~over_pass
            ke, vm_k, lam_k, stk_k, pass_k = (
                ke[sel], vm_k[sel], lam_k[sel], stk_k[sel], pass_k[sel]
            )

        spilled = nnz - len(ke)
        spill_cap = max_spill_frac * nnz
        if idroute and inkernel_extras:
            # spills ride the in-kernel extras table / stray patch
            # kernel (~10 VPU ops each, capped at 4096 strays)
            spill_cap = max(spill_cap, 4096)
        if spilled > spill_cap:
            raise WellUnsupported(
                f"{spilled}/{nnz} entries spill outside the WELL layout"
            )

        rho = np.zeros(
            (nv_pad * TABLE_ROWS, max_passes, LANES), dtype=np.int64
        )
        u_ok = passid_u < mp
        u_vm = utrip // (TABLE_ROWS * LANES)
        u_lam = (utrip // TABLE_ROWS) % LANES
        u_stk = utrip % TABLE_ROWS
        rho[u_vm[u_ok], passid_u[u_ok], u_lam[u_ok]] = u_stk[u_ok]

        # ---- slot arrays ----------------------------------------------
        lam_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int64)
        pid_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.int64)
        data_a = np.zeros((nv_pad * TABLE_ROWS, LANES), dtype=np.float64)
        lane_k = lane[ke]
        lam_a[vm_k, lane_k] = lam_k
        pid_a[vm_k, lane_k] = pass_k
        data_a[vm_k, lane_k] = vals[ke]

        # ---- packed word: lam | pid<<7 | rho_p<<(9+3p) | amap<<21 ----
        w = lam_a | (pid_a << 7)
        for p in range(mp):
            w |= rho[:, p] << (9 + 3 * p)
        w |= amap.reshape(nv_pad * TABLE_ROWS, LANES) << 21
        assert w.max(initial=0) < (1 << 31)

        # ---- rts narrow sidecar ---------------------------------------
        n_bcols = bcols if idroute else bpv
        rts = np.zeros((nv_pad * TABLE_ROWS, n_bcols), dtype=np.int64)
        if idroute:
            # at lane j, 7 bits per merge round k: overflow unit COLUMN
            # (bits 7k..7k+5) | present flag (bit 7k+6); no route — the
            # primary block IS column j.  Rounds < granted4 fold the
            # row's full units, the next round its half unit.
            enc = np.zeros(n, dtype=np.int64)
            c0 = granted[0]
            c01 = granted[0] + granted[1]
            tot = c01 + granted[2]
            for k in range(merge_rounds):
                col = np.where(
                    k < c0,
                    g + upos[0] + k,
                    np.where(
                        k < c01,
                        g + p4 + upos[1] + np.maximum(k - c0, 0),
                        g + p4 + p2 + upos[2]
                        + np.maximum(k - c01, 0),
                    ),
                )
                have = k < tot
                enc |= (
                    np.where(have, col, j_in_grp)
                    | (have.astype(np.int64) << 6)
                ) << (7 * k)
            rts[grp_ids, j_in_grp] |= enc
        else:
            rts[grp_ids, j_in_grp] |= b0
        if not idroute and merge_rounds:
            rr = np.repeat(np.arange(n), nb)
            cum = np.concatenate([[0], np.cumsum(nb)[:-1]])
            bi = b0[rr] + np.arange(nb.sum()) - np.repeat(cum, nb)
            brow = -np.ones(
                (nv_pad * TABLE_ROWS, bpv), dtype=np.int64
            )
            brow[rr // g, bi] = rr
            for k in range(merge_rounds):
                s = 1 << k
                same = np.zeros(
                    (nv_pad * TABLE_ROWS, bpv), dtype=bool
                )
                same[:, : bpv - s] = (
                    (brow[:, : bpv - s] == brow[:, s:])
                    & (brow[:, s:] >= 0)
                )
                jj = np.arange(bpv)[None, :]
                base = np.zeros_like(brow)
                rows_valid = brow >= 0
                base[rows_valid] = b0[brow[rows_valid]]
                aligned = ((jj - base) % (s << 1)) == 0
                rts |= (same & aligned).astype(np.int64) << (5 + k)

        # ---- per-tile diagnostics bounds ------------------------------
        phi_v = np.zeros(nv_pad, dtype=np.int64)
        if len(ke):
            np.maximum.at(phi_v, vm_k // TABLE_ROWS, pass_k + 1)
        pt = phi_v.reshape(t_count, f).max(axis=1)
        gt = ng_v.reshape(t_count, f).max(axis=1)

        # ---- extras ---------------------------------------------------
        ex = np.flatnonzero(~keep)  # row-major → rows_of[ex] sorted
        # In-kernel extras (idroute): XLA gather/scatter costs a fixed
        # ~85 us PER OP on this hardware regardless of count, so even a
        # handful of spills must ride the kernel.  Spilled entries
        # already OWN an (empty) slot — they were dropped for table
        # capacity, not space — so they are resurrected with the
        # reserved pass id 3: their x comes from a per-TILE extras
        # table (built exactly like stage A from a per-tile window
        # ``ex_q`` + the ``ex_tw`` eta|grp slab) through the stage-B
        # two-step gather, with the table stack index σ stored in the
        # word bits 18-20 that the idroute 3-pass cap frees (at the
        # TABLE position (m-row, λ), the same table-domain encoding
        # trick as rho).  The slot then flows through the normal
        # block-sum matmul — no scatter anywhere.
        ex_tw_a = ex_q_a = None
        n_ex_groups = 0
        if idroute and inkernel_extras and len(ex):
            has_slot = k_in_row[ex] < row_cap[rows_of[ex]]
            exs = ex[has_slot]
            if len(exs):
                e_rows = rows_of[exs]
                e_cols = indices[exs]
                e_lam = e_cols % LANES
                e_vm = e_rows // g
                e_te = e_vm // m_rows
                # one σ per word position (m-row, λ): entries sharing
                # the position must also share the column (same table
                # slot); others fall back to the legacy path
                wkey = e_vm * LANES + e_lam
                order_w = np.lexsort((e_cols, wkey))
                kw = wkey[order_w]
                neww = np.concatenate([[True], kw[1:] != kw[:-1]])
                widx = np.maximum.accumulate(
                    np.where(neww, np.arange(len(kw)), 0)
                )
                ok_sorted = e_cols[order_w] == e_cols[order_w][widx]
                e_ok = np.empty(len(exs), dtype=bool)
                e_ok[order_w] = ok_sorted
                # tile-level dedup pairs (tile, col) → table stack σ
                pkey = e_te * np.int64(ncols) + e_cols
                up, pinv = _sorted_unique_inverse(pkey)
                p_t = up // ncols
                p_c = up % ncols
                p_lam = p_c % LANES
                order_p = np.lexsort((p_c, p_lam, p_t))
                sk2 = p_t[order_p] * LANES + p_lam[order_p]
                ng2 = np.concatenate([[True], sk2[1:] != sk2[:-1]])
                gs2 = np.maximum.accumulate(
                    np.where(ng2, np.arange(len(sk2)), 0)
                )
                sig_pair = np.empty(len(up), dtype=np.int64)
                sig_pair[order_p] = np.arange(len(sk2)) - gs2
                e_ok &= (sig_pair < TABLE_ROWS)[pinv]
                # per-tile extras window (8-aligned; 5-bit grp → ≤ 32
                # groups = 256 x2d rows)
                exq_min = np.full(t_count, np.int64(1 << 60))
                sel0 = np.flatnonzero(e_ok)
                np.minimum.at(
                    exq_min, e_te[sel0], e_cols[sel0] // LANES
                )
                has_ex = exq_min < (1 << 60)
                exq = np.where(has_ex, exq_min & ~np.int64(7), 0)
                exq = np.minimum(exq, max(x2d_rows - 8 * 32, 0))
                rel_e = e_cols // LANES - exq[e_te]
                e_ok &= (rel_e >= 0) & (rel_e < 32 * 8)
                n_ex_groups = int(
                    (rel_e[e_ok] // 8).max(initial=-1) + 1
                )
            if len(exs) and n_ex_groups > 0:
                sel = np.flatnonzero(e_ok)
                res = exs[sel]  # resurrected entries
                r_vm = e_vm[sel]
                r_lane = lane[res]
                data_a[r_vm, r_lane] = vals[res]
                w[r_vm, r_lane] |= e_lam[sel] | (3 << 7)
                keep[res] = True
                # σ at the (m-row, λ) word position (bits 18-20)
                w[r_vm, e_lam[sel]] |= sig_pair[pinv[sel]] << 18
                # table-domain slab: eta|grp at (σ, λ) per used pair
                used = np.unique(pinv[sel])
                rel_p = p_c[used] // LANES - exq[p_t[used]]
                ex_tw_np = np.zeros(
                    (t_count, TABLE_ROWS, LANES), dtype=np.int64
                )
                ex_tw_np[p_t[used], sig_pair[used], p_lam[used]] = (
                    rel_p % 8
                ) | ((rel_p // 8) << 3)
                ex_tw_a = ex_tw_np
                ex_q_a = exq
                # blocked x mode streams [q_t, q_t + win_rows) per
                # tile; widen the tile windows to cover the extras
                # (sparse-group layouts are resident-only — no tile
                # window to widen)
                if gmap_np is None:
                    q_t = np.where(has_ex, np.minimum(q_t, exq), q_t)
                    end_all = np.maximum(
                        win_end,
                        np.where(has_ex, exq + 8 * n_ex_groups, 0),
                    )
                    win_rows = int((end_all - q_t).max())
                    win_rows = -(-win_rows // 8) * 8
                ex = np.flatnonzero(~keep)
        ex_urows, ex_seg = np.unique(rows_of[ex], return_inverse=True)

        def tile(a, inner, dt):
            return jnp.asarray(
                a.reshape((t_count,) + inner).astype(dt)
            )

        if gmap_np is not None:
            gmap_pad = np.zeros((t_count * f, ngs), dtype=np.int64)
            gmap_pad[: gmap_np.shape[0]] = gmap_np
            gmap_j = jnp.asarray(
                gmap_pad.reshape(t_count, 1, f * ngs), dtype=jnp.int32
            )
        else:
            gmap_j = jnp.zeros((t_count, 1, f), dtype=jnp.int32)
        return WELL(
            q=jnp.asarray(q_t, dtype=jnp.int32),
            qv=jnp.asarray(qv, dtype=jnp.int32),
            ngv=jnp.asarray(ng_v, dtype=jnp.int32),
            gt=jnp.asarray(gt, dtype=jnp.int32),
            pt=jnp.asarray(pt, dtype=jnp.int32),
            data=jnp.asarray(
                data_a.reshape(t_count, m_rows, LANES), dtype=dtype
            ),
            w=tile(w, (m_rows, LANES), np.int32),
            rts=tile(rts, (m_rows, n_bcols), np.int32),
            extra_rows=jnp.asarray(ex_urows, dtype=jnp.int32),
            extra_seg=jnp.asarray(ex_seg, dtype=jnp.int32),
            extra_cols=jnp.asarray(indices[ex], dtype=jnp.int32),
            extra_vals=jnp.asarray(vals[ex], dtype=dtype),
            shape=(int(n), int(ncols)),
            nnz=int(nnz),
            block=int(block),
            win_rows=int(win_rows),
            x2d_rows=int(x2d_rows),
            rows_per_vrow=int(g),
            vregs_per_tile=int(f),
            n_groups=int(NG),
            n_passes=int(max(n_passes, 1)),
            merge_rounds=int(merge_rounds),
            ex_tw=(
                None if ex_tw_a is None
                else jnp.asarray(ex_tw_a, dtype=jnp.int32)
            ),
            ex_q=(
                None if ex_q_a is None
                else jnp.asarray(ex_q_a, dtype=jnp.int32)
            ),
            n_ex_groups=int(n_ex_groups),
            idroute=idroute,
            bcols=int(bcols) if idroute else 0,
            compact=bool(use_compact and idroute),
            gmap=gmap_j,
            sparse_groups=bool(gmap_np is not None),
            up4=int(p4) if idroute else -1,
            up2=int(p2) if idroute else -1,
            up1=int(p1) if idroute else -1,
            block_size=int(getattr(csr, "block_size", 1)),
        )
