"""Block smoother: non-overlapping additive Schwarz with diagonal
compensation.

Reference ``BlockSmoother`` (block_smoothers.rs:89-241): per aggregate of
a partition, extract the local dense block of A, *compensate* the diagonal
for cut edges so the block stays an SPD upper bound:

- scalar dofs: dᵢ += 0.5·√(aᵢᵢ/aⱼⱼ)·|aᵢⱼ| per cut edge (i,j)
  (block_smoothers.rs:293-324),
- vector dofs (block_size>1): per cut block pair accumulate
  0.5·U·|S|·Uᵀ from the SVD of −A_IJ onto the diagonal block
  (block_smoothers.rs:326-399),

then factor each block and apply as gather → per-block solve → scatter.

TPU-native design: all aggregates are padded to the maximum aggregate dof
count; the per-block inverses are materialized once at setup (the
reference's ``into_sparse_mat`` analog, block_smoothers.rs:125-146), so
each application is a single batched (n_aggs, bmax, bmax) × (n_aggs, bmax)
matmul on the MXU plus one gather and one disjoint scatter — replacing the
reference's rayon loop of per-aggregate Cholesky solves
(block_smoothers.rs:165-214).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_amg.linop import LinearOperator
from tpu_amg.partition.partition import Partition
from tpu_amg.sparse.csr import CSR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSmoother(LinearOperator):
    inv_blocks: jax.Array  # (n_aggs, bmax, bmax) materialized block inverses
    idx: jax.Array  # (n_aggs, bmax) int32 dof indices, padded with 0
    mask: jax.Array  # (n_aggs, bmax) 1.0 valid / 0.0 padding
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    def _scatter(self, x, sol):
        """Disjoint scatter-add of per-aggregate solutions back to dofs,
        with explicit output sharding matching x when inputs are sharded."""
        out = jnp.zeros((self.n,) + x.shape[1:], dtype=x.dtype)
        idx_spec = tuple(jax.typeof(self.idx).sharding.spec)
        x_spec = tuple(jax.typeof(x).sharding.spec)
        if all(s is None for s in idx_spec + x_spec):
            return out.at[self.idx].add(sol)
        from jax.sharding import PartitionSpec as P

        return out.at[self.idx].add(sol, out_sharding=P(*x_spec))

    def mv(self, x):
        from tpu_amg.sparse.ell import _row_gather

        rhs = _row_gather(x, self.idx, 0) * self.mask  # (n_aggs, bmax)
        sol = jnp.einsum(
            "abc,ac->ab", self.inv_blocks, rhs,
            preferred_element_type=rhs.dtype,
        )
        return self._scatter(x, sol * self.mask)

    def mm(self, xs):
        from tpu_amg.sparse.ell import _row_gather

        rhs = _row_gather(xs, self.idx, 1) * self.mask[..., None]
        sol = jnp.einsum(
            "abc,acm->abm", self.inv_blocks, rhs,
            preferred_element_type=rhs.dtype,
        )
        return self._scatter(xs, sol * self.mask[..., None])

    # ------------------------------------------------------------------
    @staticmethod
    def build(a: CSR, partition: Partition, dtype=jnp.float64) -> "BlockSmoother":
        """Assemble from a host CSR matrix and a partition of its dofs.

        ``partition`` partitions *scalar* dofs; when ``a.block_size > 1``
        aggregates must contain whole blocks (guaranteed when the
        partition came from a block-contracted graph, reference
        partitioners/mod.rs:294-301).
        """
        n = a.nrows
        if partition.num_nodes != n:
            raise ValueError(
                f"partition covers {partition.num_nodes} dofs, matrix has {n}"
            )
        bs = a.block_size
        comp = _diag_compensation(a, partition.node_to_agg, bs)

        agg_lists = partition.agg_lists()
        n_aggs = len(agg_lists)
        bmax = max(len(g) for g in agg_lists)

        idx = np.zeros((n_aggs, bmax), dtype=np.int32)
        mask = np.zeros((n_aggs, bmax))
        blocks = np.tile(np.eye(bmax), (n_aggs, 1, 1))
        a_sp = a.to_scipy().tocsr()  # one conversion; C-speed slicing
        for k, dofs in enumerate(agg_lists):
            m = len(dofs)
            idx[k, :m] = dofs
            mask[k, :m] = 1.0
            blk = a_sp[dofs][:, dofs].toarray()
            if bs == 1:
                blk[np.arange(m), np.arange(m)] += comp[dofs]
            else:
                blk += comp_block_for(comp, dofs, bs)
            blocks[k, :m, :m] = blk

        inv_blocks = np.linalg.inv(blocks)
        return BlockSmoother(
            inv_blocks=jnp.asarray(inv_blocks, dtype=dtype),
            idx=jnp.asarray(idx),
            mask=jnp.asarray(mask, dtype=dtype),
            n=n,
        )


def _diag_compensation(a: CSR, node_to_agg: np.ndarray, bs: int):
    """Cut-edge diagonal compensation.

    Scalar case returns a (n,) vector of diagonal additions
    (block_smoothers.rs:293-324).  Block case returns a dict
    block_index → (bs, bs) matrix of diagonal-block additions
    (block_smoothers.rs:326-399).
    """
    rows, cols, vals = a.coo()
    cut = node_to_agg[rows] != node_to_agg[cols]
    if bs == 1:
        diag = a.diagonal()
        comp = np.zeros(a.nrows)
        r, c, v = rows[cut], cols[cut], vals[cut]
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = np.sqrt(np.abs(diag[r]) / np.abs(diag[c]))
        scale = np.where(np.isfinite(scale), scale, 1.0)
        np.add.at(comp, r, 0.5 * scale * np.abs(v))
        return comp

    # block case: group cut entries by (block_row, block_col), form the
    # dense bs×bs coupling block, SVD, accumulate 0.5·U|S|Uᵀ
    brows, bcols = rows // bs, cols // bs
    bcut = (node_to_agg[rows] != node_to_agg[cols]) & (brows != bcols)
    r, c, v = rows[bcut], cols[bcut], vals[bcut]
    br, bc = brows[bcut], bcols[bcut]
    pair_key = br * (a.ncols // bs) + bc
    order = np.argsort(pair_key, kind="stable")
    r, c, v, br, bc, pair_key = (
        r[order], c[order], v[order], br[order], bc[order], pair_key[order]
    )
    comp: dict = {}
    start = 0
    while start < len(pair_key):
        end = start
        while end < len(pair_key) and pair_key[end] == pair_key[start]:
            end += 1
        i_blk = int(br[start])
        blk = np.zeros((bs, bs))
        blk[r[start:end] % bs, c[start:end] % bs] = -v[start:end]
        u, s, _ = np.linalg.svd(blk)
        add = 0.5 * (u * np.abs(s)) @ u.T
        if i_blk in comp:
            comp[i_blk] += add
        else:
            comp[i_blk] = add
        start = end
    return comp


def comp_block_for(comp: dict, dofs: np.ndarray, bs: int) -> np.ndarray:
    """Expand per-block compensation into the local dense block layout."""
    m = len(dofs)
    out = np.zeros((m, m))
    # dofs are sorted and block-aligned within an aggregate
    for local_start in range(0, m, bs):
        blk_id = int(dofs[local_start]) // bs
        if blk_id in comp:
            out[
                local_start : local_start + bs, local_start : local_start + bs
            ] += comp[blk_id]
    return out
