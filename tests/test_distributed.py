"""Multi-device sharding: sharded SpMV/CG/multigrid on the virtual
8-device CPU mesh (SURVEY.md §4.5, §7 stage 8)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_amg.linop import SparseOperator, aslinearoperator
from tpu_amg.parallel import (
    HaloELL,
    halo_spmv,
    make_solver_mesh,
    pad_ell_identity,
    shard_ell,
    shard_multigrid,
    shard_operator,
)
from tpu_amg.parallel.dist import shard_vector
from tpu_amg.solvers import cg
from tpu_amg.sparse import ELL
from tpu_amg.utils.problems import poisson1d, poisson2d


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    m = make_solver_mesh(8)
    jax.set_mesh(m)  # mesh context for sharded gathers (ell._row_gather)
    return m


class TestShardedSpMV:
    def test_sharded_matches_single(self, mesh):
        a = poisson2d(16)  # 256 = 8 * 32
        ell = ELL.from_csr(a)
        sharded = shard_ell(ell, mesh)
        x = jnp.asarray(np.random.default_rng(0).normal(size=256))
        xs = shard_vector(x, mesh)
        y = jax.jit(lambda e, v: e.mv(v))(sharded, xs)
        np.testing.assert_allclose(np.asarray(y), a.matvec(np.asarray(x)))

    def test_pad_identity(self, mesh):
        a = poisson1d(12)  # 11 dofs -> pad to 16
        ell = pad_ell_identity(ELL.from_csr(a), 8)
        assert ell.nrows == 16
        x = jnp.asarray(np.random.default_rng(1).normal(size=16))
        y = np.asarray(ell.mv(x))
        np.testing.assert_allclose(y[:11], a.matvec(np.asarray(x[:11])))
        np.testing.assert_allclose(y[11:], np.asarray(x[11:]))

    def test_halo_spmv_matches(self, mesh):
        a = poisson2d(16)  # banded: bandwidth 16 < 32 local rows
        ell = ELL.from_csr(a)
        h = HaloELL.from_ell(ell, mesh)
        assert h.halo <= 16
        x = jnp.asarray(np.random.default_rng(2).normal(size=256))
        xs = shard_vector(x, mesh)
        y = halo_spmv(h, mesh, xs)
        np.testing.assert_allclose(
            np.asarray(y), a.matvec(np.asarray(x)), rtol=1e-12
        )

    def test_halo_spmm_matches(self, mesh):
        a = poisson2d(16)
        h = HaloELL.from_ell(ELL.from_csr(a), mesh)
        xs = jnp.asarray(np.random.default_rng(3).normal(size=(256, 4)))
        y = halo_spmv(h, mesh, shard_vector(xs, mesh))
        np.testing.assert_allclose(
            np.asarray(y), a.to_dense() @ np.asarray(xs), rtol=1e-12
        )

    def test_halo_violation_raises(self, mesh):
        # dense-ish row spanning everything breaks the band assumption
        n = 64
        rows = np.concatenate([np.arange(n), np.zeros(n, dtype=int)])
        cols = np.concatenate([np.arange(n), np.arange(n)])
        vals = np.ones(2 * n)
        from tpu_amg.sparse import CSR

        a = CSR.from_coo(rows, cols, vals, (n, n))
        with pytest.raises(ValueError):
            HaloELL.from_ell(ELL.from_csr(a), mesh)


class TestShardedSolve:
    def test_sharded_cg_matches_replicated(self, mesh):
        a = poisson2d(16)
        op = aslinearoperator(a)
        b = jnp.ones(256)
        x_ref, info_ref = cg(op, b, rtol=1e-10)

        from tpu_amg.linop import SparseOperator

        sop = shard_operator(
            SparseOperator.from_csr(a, prefer_dia=False), mesh
        )
        bs = shard_vector(b, mesh)
        x_sh, info_sh = jax.jit(
            lambda a_, b_: cg(a_, b_, rtol=1e-10)
        )(sop, bs)
        np.testing.assert_allclose(
            np.asarray(x_sh), np.asarray(x_ref), atol=1e-8
        )
        assert abs(int(info_sh.iters) - int(info_ref.iters)) <= 1

    def test_sharded_multigrid_pcg(self, mesh):
        from tpu_amg.utils.geometric import build_geometric_mg

        fine, mg = build_geometric_mg(refinements=5, coarse_elements=8)
        # fine has 8*2^5=256 elements -> 255 dofs; pad to 256
        from tpu_amg.linop import SparseOperator

        a_ell = pad_ell_identity(
            SparseOperator.from_csr(fine, prefer_dia=False).ell, 8
        )
        n = a_ell.nrows
        a_op = SparseOperator(ell=shard_ell(a_ell, mesh))
        mg_sharded = shard_multigrid(mg, mesh, replicate_below=10**9)
        b = shard_vector(jnp.ones(n).at[-1].set(0.0), mesh)

        # reference solve (single-device)
        b_ref = jnp.ones(fine.nrows)
        _, info_ref = cg(aslinearoperator(fine), b_ref, mg, rtol=1e-8)

        # NOTE: mg operates on the unpadded size; solve the padded system
        # with a preconditioner that ignores the pad row via composition
        from jax.sharding import PartitionSpec as P

        @jax.jit
        def solve(a_, b_):
            def m_pad(r):
                # gather to replicated for the (unpadded) preconditioner,
                # then reshard the result
                r_rep = jax.sharding.reshard(r, P())
                inner = mg.mv(r_rep[: fine.nrows])
                out = jnp.concatenate([inner, r_rep[fine.nrows :]])
                return jax.sharding.reshard(out, P("x"))

            m = _FnOp(fn=m_pad, n=n)
            return cg(a_, b_, m, rtol=1e-8)

        x, info = solve(a_op, b)
        assert bool(info.converged)
        assert abs(int(info.iters) - int(info_ref.iters)) <= 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _FnOp:
    fn: object = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n, self.n)

    def mv(self, x):
        return self.fn(x)


class TestSubMeshRedistribution:
    def test_fine_full_mesh_mid_submesh(self):
        """Coarse-grid redistribution: fine level sharded over the full
        (4, 2) mesh, a mid level over only the 'y' sub-axis (replicated
        across 'x'), coarsest fully replicated — one jitted solve with
        XLA inserting the cross-tier resharding collectives."""
        import jax
        from jax.sharding import PartitionSpec as P

        from tpu_amg.linop import SparseOperator
        from tpu_amg.parallel.dist import shard_ell, shard_vector
        from tpu_amg.sparse import ELL

        mesh = jax.make_mesh((4, 2), ("x", "y"))
        jax.set_mesh(mesh)
        a = poisson2d(16)  # 256 dofs: 8 | full mesh
        fine = shard_ell(ELL.from_csr(a), mesh, axis=("x", "y"))
        mid_csr = poisson2d(8)  # 64 dofs: shard over y only
        mid = shard_ell(ELL.from_csr(mid_csr), mesh, axis=("y",))

        x_f = shard_vector(jnp.ones(256), mesh, axis=("x", "y"))
        x_m = shard_vector(jnp.ones(64), mesh, axis=("y",))

        @jax.jit
        def step(fine_, mid_, xf, xm):
            yf = fine_.mv(xf)
            ym = mid_.mv(xm)
            # cross-tier: restrict fine result onto mid size (toy: slice)
            from jax.sharding import reshard

            rf = reshard(yf, P())[:64]
            return jnp.sum(ym * rf)

        val = step(fine, mid, x_f, x_m)
        ref = float(
            np.dot(mid_csr.matvec(np.ones(64)), a.matvec(np.ones(256))[:64])
        )
        np.testing.assert_allclose(float(val), ref, rtol=1e-10)
