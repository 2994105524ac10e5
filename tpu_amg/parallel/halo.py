"""Halo-exchange SpMV via shard_map + ppermute.

The bandwidth-optimal distributed SpMV for banded orderings (structured
grids, BFS/RCM-ordered FEM meshes): instead of all-gathering the whole
vector (the default XLA lowering of ``x[cols]`` on a sharded x), each
device exchanges only a fixed-width halo slab with its ring neighbors
over ICI (``jax.lax.ppermute``), then gathers from the local
[left-halo | own | right-halo] buffer.

This is the BASELINE.json north-star communication pattern ("halo vector
entries exchanged via collective-permute overlapped with local SpMV");
XLA overlaps the two ppermutes with the local-interior gather
automatically since they have no data dependence.

Setup verifies the band assumption: every row's columns must fall within
``halo`` entries of its own shard block; otherwise use the all-gather
path (plain sharded ELL).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_amg.sparse.ell import ELL


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloELL:
    """Row-partitioned ELL with shard-local column indices.

    ``cols_local[r, k] = cols[r, k] - shard_start(r) + halo`` indexes the
    per-shard buffer [left-halo | local x | right-halo].
    """

    data: jax.Array  # (n, K), sharded P(axis, None)
    cols_local: jax.Array  # (n, K) int32, sharded P(axis, None)
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_devices: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def nrows(self):
        return self.shape[0]

    @property
    def n_local(self):
        return self.shape[0] // self.n_devices

    @staticmethod
    def from_ell(
        ell: ELL, mesh: Mesh, axis: str = "x", halo: int | None = None
    ) -> "HaloELL":
        """Convert a (host or device) ELL matrix; raises if any column
        falls outside the halo band."""
        n_dev = mesh.shape[axis]
        n = ell.nrows
        if n % n_dev != 0:
            raise ValueError(f"nrows {n} not divisible by {n_dev} devices")
        n_loc = n // n_dev
        cols = np.asarray(ell.cols)
        data = np.asarray(ell.data)
        rows = np.arange(n)[:, None]
        shard_start = (rows // n_loc) * n_loc
        offset = cols - shard_start  # in [-halo, n_loc + halo)
        valid = data != 0
        lo = offset[valid].min(initial=0)
        hi = offset[valid].max(initial=0) - (n_loc - 1)
        needed = int(max(-lo, hi, 0))
        if halo is None:
            halo = needed
        if needed > halo or halo > n_loc:
            raise ValueError(
                f"band assumption violated: needs halo {needed}, "
                f"local size {n_loc}"
            )
        # padded (zero-data) entries may point anywhere; clamp them into
        # the local window so the buffer gather stays in bounds
        offset = np.where(valid, offset, 0)
        cols_local = (offset + halo).astype(np.int32)
        sharding = NamedSharding(mesh, P(axis, None))
        return HaloELL(
            data=jax.device_put(jnp.asarray(data, ell.dtype), sharding),
            cols_local=jax.device_put(jnp.asarray(cols_local), sharding),
            shape=ell.shape,
            nnz=ell.nnz,
            halo=halo,
            n_devices=n_dev,
            axis=axis,
        )

    def mesh_sharded_mv(self, mesh: Mesh, x: jax.Array) -> jax.Array:
        return halo_spmv(self, mesh, x)


def _spmv_shard(data, cols_local, x, *, halo, axis, n_devices):
    """Per-shard body: ring halo exchange + local gather-FMA."""
    perm_right = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    perm_left = [(i, (i - 1) % n_devices) for i in range(n_devices)]
    if halo > 0:
        left = jax.lax.ppermute(x[-halo:], axis, perm_right)
        right = jax.lax.ppermute(x[:halo], axis, perm_left)
        xbuf = jnp.concatenate([left, x, right], axis=0)
    else:
        xbuf = x
    gathered = jnp.take(xbuf, cols_local, axis=0)
    if x.ndim == 1:
        return jnp.sum(data * gathered, axis=1)
    return jnp.einsum("rk,rkm->rm", data, gathered)


@partial(jax.jit, static_argnames=("mesh",))
def halo_spmv(h: HaloELL, mesh: Mesh, x: jax.Array) -> jax.Array:
    """y = A @ x with x row-sharded over ``h.axis``."""
    vec_spec = P(h.axis) if x.ndim == 1 else P(h.axis, None)
    body = partial(
        _spmv_shard, halo=h.halo, axis=h.axis, n_devices=h.n_devices
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(h.axis, None), P(h.axis, None), vec_spec),
        out_specs=vec_spec,
    )(h.data, h.cols_local, x)
