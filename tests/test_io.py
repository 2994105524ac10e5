"""I/O, stats tables, viz export."""

import json

import numpy as np

from tpu_amg.sparse import CSR
from tpu_amg.utils.io import (
    load_matrix_market,
    load_mfem_linear_system,
    save_matrix_market,
    save_mfem_linear_system,
)
from tpu_amg.utils.problems import poisson2d
from tpu_amg.utils.stats import format_stats_table, matrix_stats


class TestMatrixMarket:
    def test_roundtrip_general(self, tmp_path):
        a = poisson2d(4)
        save_matrix_market(tmp_path / "a.mtx", a)
        b = load_matrix_market(tmp_path / "a.mtx")
        np.testing.assert_allclose(b.to_dense(), a.to_dense())

    def test_roundtrip_symmetric(self, tmp_path):
        a = poisson2d(4)
        save_matrix_market(tmp_path / "a.mtx", a, symmetric=True)
        b = load_matrix_market(tmp_path / "a.mtx")
        np.testing.assert_allclose(b.to_dense(), a.to_dense())

    def test_zero_dropping(self, tmp_path):
        (tmp_path / "z.mtx").write_text(
            "%%MatrixMarket matrix coordinate real general\n"
            "2 2 3\n1 1 1.0\n2 2 2.0\n1 2 0.0\n"
        )
        b = load_matrix_market(tmp_path / "z.mtx")
        assert b.nnz == 2


class TestMfem:
    def test_roundtrip_with_boundary_elimination(self, tmp_path):
        a = poisson2d(4)  # 16 dofs
        rhs = np.arange(16.0)
        coords = np.random.default_rng(0).normal(size=(16, 2))
        boundary = np.array([0, 3, 12, 15])
        save_mfem_linear_system(tmp_path, "sys", a, rhs, coords, boundary)
        sys_ = load_mfem_linear_system(tmp_path, "sys", delete_boundary=True)
        keep = np.setdiff1d(np.arange(16), boundary)
        assert sys_.matrix.nrows == 12
        np.testing.assert_allclose(
            sys_.matrix.to_dense(), a.to_dense()[np.ix_(keep, keep)]
        )
        np.testing.assert_allclose(sys_.rhs[:, 0], rhs[keep])
        np.testing.assert_allclose(sys_.coords, coords[keep])
        assert sys_.original_dimension == 16
        np.testing.assert_array_equal(sys_.index_mapping.solution_to_mesh, keep)

    def test_no_boundary_elimination(self, tmp_path):
        a = poisson2d(3)
        save_mfem_linear_system(
            tmp_path, "sys", a, np.ones(9), np.zeros((9, 2)), np.array([0])
        )
        sys_ = load_mfem_linear_system(tmp_path, "sys", delete_boundary=False)
        assert sys_.matrix.nrows == 9


class TestStats:
    def test_matrix_stats_values(self):
        a = poisson2d(4)
        s = matrix_stats(a)
        assert s.rows == 16
        assert s.max_per_row == 5
        assert s.min_per_row == 3
        assert s.max_val == 4.0
        assert s.min_val == -1.0

    def test_table_formats(self):
        stats = [matrix_stats(poisson2d(4)), matrix_stats(poisson2d(2))]
        table = format_stats_table(stats)
        assert "level 0" in table and "16" in table


class TestViz:
    def test_hierarchy_viz_json(self, tmp_path):
        from tests.test_hierarchy import near_null_basis, sa_config
        from tpu_amg.hierarchy import HierarchyConfig
        from tpu_amg.utils.viz import dump_hierarchy_viz

        a = poisson2d(8)
        nn = near_null_basis(a, k=2)
        h = HierarchyConfig(
            coarsest_dim=10, interpolation_config=sa_config()
        ).build(a, nn)
        out = tmp_path / "viz.json"
        dump_hierarchy_viz(h, out)
        payload = json.loads(out.read_text())
        assert len(payload["levels"]) == h.num_levels - 1
        assert len(payload["levels"][0]["node_to_agg"]) == 64


class TestVtk:
    VTK_POLYDATA = """\
# vtk DataFile Version 3.0
mesh
ASCII
DATASET POLYDATA
POINTS 4 float
0 0 0
1 0 0
0 1 0
1 1 0
POLYGONS 2 9
3 0 1 2
4 1 3 2 0
"""

    VTK_UGRID = """\
# vtk DataFile Version 3.0
mesh
ASCII
DATASET UNSTRUCTURED_GRID
POINTS 3 double
0 0 0
1 0 0
0 1 0
CELLS 2 6
3 0 1 2
1 0
CELL_TYPES 2
5
1
"""

    def test_polydata_fan_triangulation(self, tmp_path):
        from tpu_amg.utils.io import load_vtk_triangle_mesh

        p = tmp_path / "m.vtk"
        p.write_text(self.VTK_POLYDATA)
        geo = load_vtk_triangle_mesh(p)
        assert geo.points.shape == (4, 3)
        # triangle + quad fan-triangulated into two
        assert geo.cells.shape == (3, 3)
        np.testing.assert_array_equal(geo.cells[0], [0, 1, 2])
        np.testing.assert_array_equal(geo.cells[1], [1, 3, 2])
        np.testing.assert_array_equal(geo.cells[2], [1, 2, 0])

    def test_unstructured_grid_skips_non_triangles(self, tmp_path):
        from tpu_amg.utils.io import load_vtk_triangle_mesh

        p = tmp_path / "m.vtk"
        p.write_text(self.VTK_UGRID)
        geo = load_vtk_triangle_mesh(p)
        assert geo.cells.shape == (1, 3)

    def test_mfem_loader_walks_parents_for_vtk(self, tmp_path):
        # reference find_associated_vtk (utils.rs:536-551): the .vtk may
        # sit in ANY ancestor directory of the dataset dir
        sub = tmp_path / "data" / "runs"
        sub.mkdir(parents=True)
        a = poisson2d(3)
        save_mfem_linear_system(
            sub, "sys", a, np.ones(9), np.zeros((9, 2)), np.array([0])
        )
        (tmp_path / "sys.vtk").write_text(self.VTK_POLYDATA)
        sys_ = load_mfem_linear_system(sub, "sys", delete_boundary=False)
        assert sys_.mesh_geometry is not None
        assert sys_.mesh_geometry.cells.shape == (3, 3)

    def test_mfem_loader_without_vtk(self, tmp_path):
        a = poisson2d(3)
        save_mfem_linear_system(
            tmp_path, "sys", a, np.ones(9), np.zeros((9, 2)), np.array([0])
        )
        sys_ = load_mfem_linear_system(tmp_path, "sys", delete_boundary=False)
        assert sys_.mesh_geometry is None
