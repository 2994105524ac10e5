"""Partition structure, strength graph, modularity partitioner
(SURVEY.md §7 stage 4)."""

import numpy as np
import pytest

from tpu_amg.partition import (
    Partition,
    PartitionerConfig,
    strength_graph,
)
from tpu_amg.utils.problems import poisson1d, poisson2d, anisotropic_diffusion_2d


class TestPartition:
    def test_singleton(self):
        p = Partition.singleton(5)
        assert p.num_aggs == 5
        p.validate()

    def test_renumber_contiguous(self):
        p = Partition([5, 5, 9, 2, 2])
        assert p.num_aggs == 3
        assert p.node_to_agg.tolist() == [0, 0, 1, 2, 2]

    def test_compose(self):
        fine = Partition([0, 0, 1, 1, 2, 2])
        coarse = Partition([0, 0, 1])
        flat = fine.compose(coarse)
        assert flat.node_to_agg.tolist() == [0, 0, 0, 0, 1, 1]

    def test_agg_lists_roundtrip(self):
        p = Partition([1, 0, 1, 2, 0])
        rebuilt = Partition.from_agg_lists(p.agg_lists(), 5)
        np.testing.assert_array_equal(rebuilt.node_to_agg, p.node_to_agg)

    def test_expand_blocks(self):
        p = Partition([0, 1, 0])
        e = p.expand_blocks(2)
        assert e.node_to_agg.tolist() == [0, 0, 1, 1, 0, 0]

    def test_stats(self):
        p = Partition([0, 0, 0, 1])
        s = p.info()
        assert s.num_aggs == 2
        assert s.coarsening_factor == 2.0
        assert s.max_agg_size == 3


class TestStrengthGraph:
    def test_constant_near_null_poisson(self):
        # constant vector: all neighbors perfectly correlated -> all kept
        # weights equal 1 (flat-distance branch)
        a = poisson1d(9)
        nn = np.ones((8, 1))
        g = strength_graph(a, nn, np.ones(1), max_depth=2)
        assert g.adj.nnz > 0
        assert np.allclose(g.adj.data, 1.0)

    def test_depth_grows_neighborhood(self):
        a = poisson1d(17)
        nn = np.random.default_rng(0).normal(size=(16, 4))
        g1 = strength_graph(a, nn, np.ones(4), max_depth=1)
        g3 = strength_graph(a, nn, np.ones(4), max_depth=3)
        # depth-3 reach has more candidate edges before filtering; kept
        # edges should be at least as many
        assert g3.adj.nnz >= g1.adj.nnz

    def test_anisotropy_directionality(self):
        # strong x-direction coupling: smooth vectors vary slowly in x;
        # strength graph should prefer x-neighbors
        n = 8
        a = anisotropic_diffusion_2d(n, epsilon=1e-4, theta=0.0)
        rng = np.random.default_rng(1)
        # smooth random vectors a bit with jacobi to expose anisotropy
        from tpu_amg.linop import aslinearoperator
        from tpu_amg.preconditioners import build_smoother, ErrorPropagator
        import jax.numpy as jnp

        op = aslinearoperator(a)
        m = build_smoother("l1", op.ell)
        e = ErrorPropagator(a=op, m=m, iters=10)
        v = jnp.asarray(rng.normal(size=(n * n, 8)))
        nn = np.asarray(e.mm(v))
        g = strength_graph(a, nn, np.ones(8), max_depth=1)
        rows, cols, w = g.edges()
        # x-neighbors differ by n (row-major (x,y) with y fastest): idx = x*n+y
        same_x = np.abs(rows - cols) < n  # same column-block => y-direction
        x_dir = ~same_x
        # anisotropic in x => x-direction edges stronger on average
        assert w[x_dir].mean() > w[same_x].mean()

    def test_mis_covers_graph(self):
        a = poisson2d(6)
        nn = np.ones((36, 1))
        g = strength_graph(a, nn, np.ones(1), max_depth=1)
        f = np.ones(36, dtype=bool)
        c = g.maximal_independent_set(f)
        assert not f.any()
        assert len(c) >= 1
        # independence w.r.t. the directed filtered graph (the reference's
        # MIS clears only each chosen node's own kept-neighbor list,
        # mod.rs:395-423): no two chosen nodes may share a *mutual* edge
        adj = g.adj.toarray() > 0
        for i in c:
            for j in c:
                if i != j:
                    assert not (adj[i, j] and adj[j, i])


class TestModularityPartitioner:
    @pytest.mark.parametrize("cf", [4.0, 8.0])
    def test_poisson2d_partition_quality(self, cf):
        n = 16
        a = poisson2d(n)
        nn = np.ones((n * n, 1))
        cfg = PartitionerConfig(coarsening_factor=cf, max_improvement_iters=20)
        part = cfg.build_partition(a, nn, np.ones(1))
        part.validate()
        stats = part.info()
        # achieved coarsening within a reasonable band of target
        assert stats.coarsening_factor >= cf * 0.5
        assert stats.coarsening_factor <= cf * 2.5
        # no empty aggregates, no giant aggregates
        assert stats.min_agg_size >= 1
        assert stats.max_agg_size <= int(cf * 4)

    def test_aggregates_connected_ish(self):
        # aggregates of a 1-D chain should be intervals (mostly)
        a = poisson1d(65)
        nn = np.ones((64, 1))
        cfg = PartitionerConfig(coarsening_factor=4.0)
        part = cfg.build_partition(a, nn, np.ones(1))
        # every aggregate's node set should span a small range
        for nodes in part.agg_lists():
            assert nodes.max() - nodes.min() <= 3 * len(nodes)

    def test_block_contraction(self):
        from tpu_amg.utils.problems import elasticity_3d

        a = elasticity_3d(4)  # 192 dofs, block_size 3
        nn = np.ones((a.nrows, 1))
        cfg = PartitionerConfig(coarsening_factor=8.0)
        part = cfg.build(a, nn, np.ones(1)).partition
        # partition is over block nodes (64)
        assert part.num_nodes == a.nrows // 3
        scalar = part.expand_blocks(3)
        assert scalar.num_nodes == a.nrows
        # blocks stay together: dofs of one block share an aggregate
        n2a = scalar.node_to_agg.reshape(-1, 3)
        assert (n2a == n2a[:, :1]).all()

    def test_callback_invoked(self):
        calls = []
        a = poisson2d(8)
        nn = np.ones((64, 1))
        cfg = PartitionerConfig(
            coarsening_factor=4.0,
            callback=lambda it, p: calls.append(it),
        )
        cfg.build_partition(a, nn, np.ones(1))
        assert len(calls) >= 1


class TestMultilevelPartitioner:
    def test_staged_composition(self):
        from tpu_amg.partition import MultilevelPartitionerConfig
        from tpu_amg.utils.problems import poisson2d

        a = poisson2d(16)
        nn = np.ones((256, 1))
        cfg = MultilevelPartitionerConfig.even_stages(
            16.0, n_stages=2, max_improvement_iters=10
        )
        part = cfg.build_partition(a, nn, np.ones(1))
        part.validate()
        stats = part.info()
        assert part.num_nodes == 256
        assert 8.0 <= stats.coarsening_factor <= 32.0

    def test_rebase(self):
        from tpu_amg.partition import ModularityPartitioner, strength_graph
        from tpu_amg.utils.problems import poisson2d

        a = poisson2d(12)
        nn = np.ones((144, 1))
        g = strength_graph(a, nn, np.ones(1), max_depth=2)
        p = ModularityPartitioner(g, PartitionerConfig(coarsening_factor=4.0))
        p.initialize_partition()
        p.improve_partition()
        base = p.partition
        p2 = ModularityPartitioner(g, PartitionerConfig(coarsening_factor=4.0))
        p2.rebase(base)
        coarse = p2.partition
        composed = base.compose(coarse)
        composed.validate()
        assert composed.num_aggs < base.num_aggs


class TestSplitDisconnected:
    def test_all_aggregates_connected_after_build(self):
        from scipy.sparse.csgraph import connected_components
        import scipy.sparse as sps

        a = poisson2d(16)
        nn = np.random.default_rng(3).normal(size=(256, 4))
        cfg = PartitionerConfig(coarsening_factor=8.0, max_improvement_iters=30)
        partitioner = cfg.build(a, nn, np.ones(4))
        part = partitioner.partition
        rows, cols, _ = partitioner.base_graph.edges()
        agg = part.node_to_agg
        intra = agg[rows] == agg[cols]
        sub = sps.coo_matrix(
            (np.ones(int(intra.sum())), (rows[intra], cols[intra])),
            shape=(256, 256),
        )
        n_comp, _ = connected_components(sub, directed=False)
        assert n_comp == part.num_aggs  # every aggregate is one component

    def test_split_can_be_disabled(self):
        a = poisson2d(12)
        nn = np.ones((144, 1))
        cfg = PartitionerConfig(
            coarsening_factor=8.0, split_disconnected=False
        )
        part = cfg.build_partition(a, nn, np.ones(1))
        part.validate()  # reference behavior preserved behind the flag
