"""Coarse-level RCM reordering (multigrid_builder.reorder_levels).

cd=1 / hub-row Galerkin levels inherit aggregate ordering whose
bandwidth defeats the windowed device formats; the builder RCM-reorders
such levels and folds the permutation into R/P, so the cycle must be
exactly similarity-equivalent (same output in fine numbering).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_amg.hierarchy import HierarchyConfig, create_weights
from tpu_amg.interpolation import AggregationConfig, InterpolationConfig
from tpu_amg.partition import PartitionerConfig
from tpu_amg.preconditioners.multigrid_builder import MultigridConfig
from tpu_amg.sparse.csr import CSR


def _scrambled_poisson(nx, seed=0):
    import scipy.sparse as sps

    n = nx * nx
    d = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx))
    eye = sps.identity(nx)
    a = (sps.kron(d, eye) + sps.kron(eye, d)).tocsr()
    p = np.random.default_rng(seed).permutation(n)
    a = a[p][:, p].tocsr()
    a.sort_indices()
    return CSR.from_scipy(a)


@pytest.fixture(scope="module")
def hierarchy():
    a = _scrambled_poisson(48)
    nn = np.ones((a.nrows, 1))
    hier = HierarchyConfig(
        coarsest_dim=40,
        max_levels=4,
        interpolation_config=InterpolationConfig(
            kind="aggregation",
            aggregation=AggregationConfig(
                candidate_dimension=1,
                partitioner_config=PartitionerConfig(
                    coarsening_factor=8.0, max_improvement_iters=5
                ),
            ),
        ),
    ).build(a, nn, create_weights(a, nn))
    return a, hier


def _mg(hier, reorder):
    return MultigridConfig(
        smoothing_steps=1,
        smoother="l1",
        prefer_dia=False,
        dense_threshold=64,
        dtype=jnp.float64,
        reorder_levels=reorder,
    ).build(hier)


class TestLevelReorder:
    def test_similarity_equivalence(self, hierarchy):
        a, hier = hierarchy
        mg_plain = _mg(hier, reorder=False)
        mg_rcm = _mg(hier, reorder=True)
        b = np.random.default_rng(1).standard_normal(a.nrows)
        y0 = np.asarray(mg_plain.mv(jnp.asarray(b)))
        y1 = np.asarray(mg_rcm.mv(jnp.asarray(b)))
        scale = np.abs(y0).max()
        np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-10 * scale)

    def test_reordering_adopted_and_band_reduced(self, hierarchy):
        a, hier = hierarchy
        cfg = MultigridConfig(
            smoother="l1", prefer_dia=False, dense_threshold=64,
            reorder_levels=True,
        )
        perms = cfg._level_perms(hier)
        assert any(p is not None for p in perms), (
            "scrambled-ordering coarse levels should adopt RCM"
        )
        from tpu_amg.utils.reorder import bandwidth, permute_symmetric

        for lvl, p in enumerate(perms):
            if p is None:
                continue
            op = hier.get_op(lvl)
            assert bandwidth(permute_symmetric(op, p)) < bandwidth(op)

    def test_block_rcm_keeps_blocks(self):
        from tpu_amg.utils.reorder import block_rcm_permutation

        a = _scrambled_poisson(12)
        # fake a block-2 matrix by kron with I2
        import scipy.sparse as sps

        sp2 = sps.kron(a.to_scipy(), sps.identity(2)).tocsr()
        sp2.sort_indices()
        c = CSR.from_scipy(sp2)
        c = dataclasses.replace(c, block_size=2)
        perm = block_rcm_permutation(c)
        # block pairs stay adjacent and aligned
        assert (perm.reshape(-1, 2)[:, 0] % 2 == 0).all()
        assert (perm.reshape(-1, 2)[:, 1] == perm.reshape(-1, 2)[:, 0] + 1).all()
