"""Hybrid DIA + WELL operator — the production unstructured SpMV.

An RCM'd FEM matrix has heavy *diagonal* mass: on the 1M jittered-
Delaunay bench system the top-4 diagonal offsets carry 33.8% of the
nnz (main diagonal 100% filled, next offsets 60%/40%/16%).  Those
entries are exactly the ones the DIA slice-FMA path streams at
160+ Gnnz/s with zero gathers (sparse/dia.py), while every entry
routed through WELL costs table-gather work.  The split:

  * offsets whose fill count ≥ ``fill_min``·n become partially-filled
    DIA streams (zeros where the diagonal has holes — a diagonal at
    fill f still moves the full n-length value stream, so the win
    threshold is f · DIA-rate > WELL-rate ⇒ f ≳ 8-10%);
  * the remainder builds a WELL with ``block=4`` lane-blocks: post-
    split rows hold ~4-5 entries, which 8-slot blocks would pad ~2x
    (sparse/well.py item 4).

The reference's single ParSpmm kernel (par_spmm.rs:31-132) plays both
roles at once on CPU; on TPU the bandwidth-optimal format is different
for the diagonal-dense and scattered parts, so the operator is a sum.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_amg.sparse.csr import CSR
from tpu_amg.sparse.dia import DIA
from tpu_amg.sparse.well import WELL, WellUnsupported


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridDiaWell:
    """y = (DIA part + WELL part) @ x; see module docstring."""

    dia: DIA
    well: WELL
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    block_size: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )

    @property
    def nrows(self):
        return self.shape[0]

    @property
    def ncols(self):
        return self.shape[1]

    @property
    def dtype(self):
        return self.well.dtype

    @property
    def n_extras(self):
        return self.well.n_extras

    def mv(self, x: jax.Array) -> jax.Array:
        return self.dia.mv(x) + self.well.mv(x)

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim > 1:
            return jnp.stack(
                [self.mv(x[:, j]) for j in range(x.shape[1])], 1
            )
        return self.mv(x)

    def mm(self, xs: jax.Array) -> jax.Array:
        return self.__call__(xs)

    def rmv(self, x: jax.Array) -> jax.Array:
        return self.mv(x)  # symmetric use only

    def astype_values(self, dtype) -> "HybridDiaWell":
        """bf16 value streams for both parts (vectors stay f32)."""
        return dataclasses.replace(
            self,
            dia=self.dia.astype(dtype),
            well=self.well.astype_values(dtype),
        )

    def __repr__(self):
        return (
            f"HybridDiaWell(shape={self.shape}, nnz={self.nnz}, "
            f"dia={len(self.dia.offsets)} diags "
            f"({self.dia.nnz / max(self.nnz, 1):.0%} nnz), "
            f"well={self.well!r})"
        )

    # ------------------------------------------------------------------
    @staticmethod
    def from_csr(
        csr: CSR,
        dtype=jnp.float32,
        fill_min: float = 0.10,
        max_diags: int = 12,
        min_cover: float = 0.12,
        **well_kw,
    ) -> "HybridDiaWell":
        """Split ``csr`` into dominant-diagonal DIA streams + a block-4
        WELL remainder.  Raises WellUnsupported when the diagonal part
        would not carry at least ``min_cover`` of the nnz (callers fall
        back to a plain block-8 WELL) or when the remainder is not
        band-structured."""
        if not csr.is_square:
            raise WellUnsupported("hybrid split needs a square matrix")
        n = csr.nrows
        rows, cols, vals = csr.coo()
        offs = cols - rows
        uniq, inv, counts = np.unique(
            offs, return_inverse=True, return_counts=True
        )
        order = np.argsort(-counts)
        sel = order[: max_diags]
        sel = sel[counts[sel] >= fill_min * n]
        cover = counts[sel].sum() / max(csr.nnz, 1)
        if len(sel) == 0 or cover < min_cover:
            raise WellUnsupported(
                f"dominant diagonals cover only {cover:.0%} of nnz"
            )
        sel_offsets = np.sort(uniq[sel])
        on_dia = np.isin(inv, sel)

        dia_data = np.zeros((len(sel_offsets), n))
        d_idx = np.searchsorted(sel_offsets, offs[on_dia])
        dia_data[d_idx, rows[on_dia]] = vals[on_dia]
        dia = DIA(
            data=jnp.asarray(dia_data, dtype=dtype),
            offsets=tuple(int(o) for o in sel_offsets),
            shape=csr.shape,
            nnz=int(on_dia.sum()),
            block_size=csr.block_size,
        )

        rest = CSR.from_coo(
            rows[~on_dia], cols[~on_dia], vals[~on_dia], csr.shape
        ).with_block_size(csr.block_size)
        # lane-block granularity: 4 packs sparse 2-D remainders (~4-5
        # nnz/row) ~40% tighter, but 3-D Galerkin levels keep 12-40
        # nnz/row after the split and block-4 either exhausts the
        # identity-route overflow budget (cap 4+4*4=20) or packs x3.5
        # slots in the legacy layout (round-5 probe: 159k level-1 at
        # x3.54); 8-slot blocks hold such rows in 1-2 blocks
        mean_rest = rest.nnz / max(rest.nrows, 1)
        blk = 4 if mean_rest <= 8.0 else 8
        well = WELL.from_csr(
            rest, dtype=dtype, **{"block": blk, **well_kw}
        )
        return HybridDiaWell(
            dia=dia,
            well=well,
            shape=csr.shape,
            nnz=csr.nnz,
            block_size=csr.block_size,
        )


def try_hybrid_or_well(csr: CSR, dtype=jnp.float32, **well_kw):
    """Best unstructured device format: hybrid split when the diagonal
    mass supports it, plain WELL otherwise; None when neither fits."""
    try:
        return HybridDiaWell.from_csr(csr, dtype=dtype, **well_kw)
    except WellUnsupported:
        pass
    try:
        if "block" not in well_kw:
            mean = csr.nnz / max(csr.nrows, 1)
            blk = 4 if mean <= 6.0 else 8
            well_kw = {"block": blk, **well_kw}
        return WELL.from_csr(csr, dtype=dtype, **well_kw)
    except WellUnsupported:
        return None
