import numpy as np
import pytest

from seaice_tpu.mesh import planar_quad_mesh, planar_hex_mesh


@pytest.mark.parametrize("periodic", [False, True])
def test_quad_mesh_counts(periodic):
    nx, ny, dc = 6, 5, 1000.0
    if periodic:
        ny = 6
    m = planar_quad_mesh(nx, ny, dc, periodic=periodic)
    assert m.n_cells == nx * ny
    if periodic:
        assert m.n_vertices == nx * ny
        assert m.n_edges == 2 * nx * ny
        assert (m.interior_vertex == 1).all()
    else:
        assert m.n_vertices == (nx + 1) * (ny + 1)
        assert m.n_edges == nx * (ny + 1) + (nx + 1) * ny
        # interior vertices are those with all 4 cells
        assert m.interior_vertex.sum() == (nx - 1) * (ny - 1)
    assert m.vertex_degree == 4
    np.testing.assert_allclose(m.area_cell, dc * dc)
    assert (m.n_edges_on_cell == 4).all()


def test_quad_mesh_geometry():
    m = planar_quad_mesh(4, 4, 2.0, periodic=True)
    # kite areas: dc^2/4 each, dual area dc^2
    np.testing.assert_allclose(m.kite_areas_on_vertex, 1.0)
    np.testing.assert_allclose(m.area_triangle, 4.0)
    np.testing.assert_allclose(m.dv_edge, 2.0)
    np.testing.assert_allclose(m.dc_edge, 2.0)
    # local coords are the CCW unit square corners
    assert m.x_local.shape == (16, 4)
    np.testing.assert_allclose(np.abs(m.x_local), 1.0)
    np.testing.assert_allclose(np.abs(m.y_local), 1.0)


def test_quad_cell_vertices_at_vertex_consistency():
    m = planar_quad_mesh(5, 4, 1.0, periodic=False)
    for v in range(m.n_vertices):
        for k in range(m.vertex_degree):
            c = m.cells_on_vertex[v, k]
            if c < 0:
                continue
            local = m.cell_vertices_at_vertex[v, k]
            assert local >= 0
            assert m.vertices_on_cell[c, local] == v


@pytest.mark.parametrize("periodic", [False, True])
def test_hex_mesh(periodic):
    nx, ny, dc = 6, 6, 1000.0
    m = planar_hex_mesh(nx, ny, dc, periodic=periodic)
    assert m.n_cells == nx * ny
    assert m.vertex_degree == 3
    if periodic:
        assert m.n_vertices == 2 * nx * ny
        assert m.n_edges == 3 * nx * ny
        assert (m.interior_vertex == 1).all()
        # hexagon area = sqrt(3)/2 dc^2
        np.testing.assert_allclose(m.area_cell, np.sqrt(3.0) / 2 * dc**2)
        # dual triangle area = sqrt(3)/4 dc^2
        np.testing.assert_allclose(m.area_triangle,
                                   np.sqrt(3.0) / 4 * dc**2)
        np.testing.assert_allclose(m.dv_edge, dc / np.sqrt(3.0))
        np.testing.assert_allclose(m.dc_edge, dc)


def test_hex_ccw_ordering():
    m = planar_hex_mesh(4, 4, 1.0, periodic=True)
    # shoelace signed area must be positive (CCW ordering) for every cell
    for c in range(m.n_cells):
        n = m.n_edges_on_cell[c]
        x = m.x_local[c, :n]
        y = m.y_local[c, :n]
        signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        assert signed > 0
