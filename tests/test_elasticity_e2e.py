"""End-to-end vector-dof (block_size=3) AMG on 3-D elasticity:
block-contracted partitioning, block-Jacobi prolongation smoothing,
SVD-based block diagonal compensation (reference's vector use case,
core.rs:22-36)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_amg.adaptivity import find_near_null
from tpu_amg.hierarchy import HierarchyConfig, create_weights
from tpu_amg.interpolation import AggregationConfig, InterpolationConfig
from tpu_amg.linop import aslinearoperator
from tpu_amg.partition import PartitionerConfig
from tpu_amg.preconditioners.multigrid_builder import MultigridConfig
from tpu_amg.solvers import cg
from tpu_amg.utils.problems import elasticity_3d


@pytest.fixture(scope="module")
def elasticity_amg():
    a = elasticity_3d(5)  # 375 dofs, block_size 3
    nn = find_near_null(a, 10, 5, 16.0, jax.random.PRNGKey(0))
    basis, _ = np.linalg.qr(
        np.concatenate([np.ones((a.nrows, 1)), nn], axis=1)
    )
    cfg = HierarchyConfig(
        coarsest_dim=60,
        interpolation_config=InterpolationConfig(
            kind="aggregation",
            aggregation=AggregationConfig(
                candidate_dimension=6,
                partitioner_config=PartitionerConfig(
                    coarsening_factor=4.0, max_improvement_iters=10
                ),
            ),
        ),
    )
    h = cfg.build(a, basis, create_weights(a, basis))
    return a, h


def test_hierarchy_block_structure(elasticity_amg):
    a, h = elasticity_amg
    assert h.num_levels >= 2
    assert h.matrices[0].block_size == 3
    # coarse block size = candidate_dimension (hierarchy.rs:210-213)
    assert h.matrices[1].block_size == 6
    # galerkin symmetry
    ac = h.matrices[1].to_dense()
    np.testing.assert_allclose(ac, ac.T, atol=1e-8)
    assert np.linalg.eigvalsh(ac).min() > -1e-10


def test_block_amg_pcg(elasticity_amg):
    a, h = elasticity_amg
    mg = MultigridConfig(
        smoothing_steps=2,
        smoother_partitioner=PartitionerConfig(
            coarsening_factor=8.0, max_improvement_iters=10
        ),
    ).build(h)
    op = aslinearoperator(a)
    b = jnp.ones(a.nrows)
    _, plain = cg(op, b, rtol=1e-8)
    _, amg = cg(op, b, mg, rtol=1e-8)
    assert bool(amg.converged)
    assert int(amg.iters) < int(plain.iters)


def test_block_amg_chebyshev(elasticity_amg):
    a, h = elasticity_amg
    mg = MultigridConfig(smoother="chebyshev", smoothing_steps=1).build(h)
    op = aslinearoperator(a)
    b = jnp.ones(a.nrows)
    _, info = cg(op, b, mg, rtol=1e-8)
    assert bool(info.converged)
    assert int(info.iters) <= 40
