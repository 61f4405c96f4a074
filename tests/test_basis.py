import numpy as np
import pytest

from seaice_tpu.mesh import planar_quad_mesh, planar_hex_mesh
from seaice_tpu.ops.basis import (
    compute_variational_basis, _wachspress_coefficients, _wachspress_eval)


def test_wachspress_partition_of_unity():
    m = planar_hex_mesh(3, 4, 1000.0, periodic=True)
    xl = m.x_local[:, :6]
    yl = m.y_local[:, :6]
    A, B, kappa = _wachspress_coefficients(xl, yl)
    rng = np.random.default_rng(0)
    # random points inside the hexagon (shrink factor keeps them interior)
    t = rng.uniform(0.05, 0.6, size=(m.n_cells, 10))
    k = rng.integers(0, 6, size=(m.n_cells, 10))
    px = np.take_along_axis(xl, k, axis=1) * t
    py = np.take_along_axis(yl, k, axis=1) * t
    phi, dx, dy = _wachspress_eval(A, B, kappa, px, py)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(dx.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(dy.sum(axis=1), 0.0, atol=1e-12)
    # cardinal property at the vertices
    phi_v, _, _ = _wachspress_eval(A, B, kappa, xl, yl)
    np.testing.assert_allclose(
        phi_v, np.broadcast_to(np.eye(6), phi_v.shape), atol=1e-10)


def test_wachspress_linear_reproduction():
    """Wachspress coordinates reproduce linear functions exactly."""
    m = planar_hex_mesh(2, 2, 7.0, periodic=True)
    xl = m.x_local[:, :6]
    yl = m.y_local[:, :6]
    A, B, kappa = _wachspress_coefficients(xl, yl)
    rng = np.random.default_rng(1)
    t = rng.uniform(0.0, 0.7, size=(m.n_cells, 20))
    k = rng.integers(0, 6, size=(m.n_cells, 20))
    px = np.take_along_axis(xl, k, axis=1) * t
    py = np.take_along_axis(yl, k, axis=1) * t
    phi, dx, dy = _wachspress_eval(A, B, kappa, px, py)
    # f(x, y) = 2x - 3y interpolated through vertex values
    f_v = 2 * xl - 3 * yl
    f_interp = (phi * f_v[:, :, None]).sum(axis=1)
    np.testing.assert_allclose(f_interp, 2 * px - 3 * py, atol=1e-9)
    dfdx = (dx * f_v[:, :, None]).sum(axis=1)
    dfdy = (dy * f_v[:, :, None]).sum(axis=1)
    np.testing.assert_allclose(dfdx, 2.0, atol=1e-9)
    np.testing.assert_allclose(dfdy, -3.0, atol=1e-9)


def _quad_mesh_basis(basis="wachspress"):
    m = planar_quad_mesh(3, 3, 2.0, periodic=True)
    vb = compute_variational_basis(m, basis_type=basis)
    return m, vb


def test_wachspress_quad_exact_values():
    """On a square, Wachspress = bilinear; integrals are known exactly.

    Square side a=2 (local coords +-1): with CCW corners, for basis i:
      int phi_i^2       = a^2/9
      int phi_i phi_adj = a^2/18
      int phi_i phi_opp = a^2/36
    and gradient of phi at its own corner is (+-1/a, +-1/a).
    """
    m, vb = _quad_mesh_basis()
    a = 2.0
    sm = vb.basis_integrals_metric[0]
    expect = np.array([
        [a**2 / 9, a**2 / 18, a**2 / 36, a**2 / 18],
        [a**2 / 18, a**2 / 9, a**2 / 18, a**2 / 36],
        [a**2 / 36, a**2 / 18, a**2 / 9, a**2 / 18],
        [a**2 / 18, a**2 / 36, a**2 / 18, a**2 / 9],
    ])
    np.testing.assert_allclose(sm, expect, rtol=1e-9)

    # gradient of basis 0 (corner SW=(-1,-1)) of bilinear
    # phi0 = (1-x)(1-y)/4 on [-1,1]^2: d/dx at SW = -1/2, at SE = -1/2,
    # at NE = 0, at NW = 0 -- but Wachspress sparsity zeroes non-neighbors.
    gu = vb.basis_gradient_u[0]
    gv = vb.basis_gradient_v[0]
    np.testing.assert_allclose(gu[0], [-0.5, -0.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(gv[0], [-0.5, 0.0, 0.0, -0.5], atol=1e-12)

    # integrals: sum over stress basis of SM column = int phi_g = a^2/4
    np.testing.assert_allclose(sm.sum(axis=0), a**2 / 4, rtol=1e-9)
    # partition of unity on gradients: sum over basis of gradient = 0
    np.testing.assert_allclose(vb.basis_gradient_u.sum(axis=1), 0.0,
                               atol=1e-12)
    # divergence theorem: int dphi_g/dx over cell = contour integral of
    # phi_g nx ds; for basis g on square side a: = 0 in x if corners
    # symmetric... check against direct bilinear value:
    # int d/dx phi0 = -a/2 * a /a = -a/2 ... use exact: phi0=(1-x)(1-y)/4
    # int_{-1..1} dx dy of -(1-y)/4 = -2 -> scaled: a=2 -> -1? compute:
    # d/dx phi0 = -(1-y)/4; integral over [-1,1]^2 = -(1/4)*2*2 = -1
    su = vb.basis_integrals_u[0]
    np.testing.assert_allclose(su.sum(axis=0), [-1.0, 1.0, 1.0, -1.0],
                               rtol=1e-9)


@pytest.mark.parametrize("basis", ["wachspress", "pwl"])
def test_basis_integral_consistency_hex(basis):
    m = planar_hex_mesh(3, 4, 1000.0, periodic=True)
    vb = compute_variational_basis(m, basis_type=basis)
    area = m.area_cell[0]
    # total mass matrix integral = cell area
    np.testing.assert_allclose(vb.basis_integrals_metric.sum(axis=(1, 2)),
                               area, rtol=1e-8)
    # sum over g of S_U = int d/dx (sum phi) = 0
    np.testing.assert_allclose(vb.basis_integrals_u.sum(axis=2), 0.0,
                               atol=area * 1e-12)
    # gradient partition of unity
    np.testing.assert_allclose(vb.basis_gradient_u.sum(axis=1), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(vb.basis_gradient_v.sum(axis=1), 0.0,
                               atol=1e-12)


def test_variational_denominator_types():
    m = planar_hex_mesh(3, 4, 1000.0, periodic=True)
    vb_orig = compute_variational_basis(m, denominator_type="original")
    vb_alt = compute_variational_basis(m, denominator_type="alternate")
    np.testing.assert_allclose(vb_orig.variational_denominator,
                               m.area_triangle)
    # alternate denominator: sum of mass-matrix rows around the vertex;
    # for a uniform mesh this approximates the dual area
    ratio = vb_alt.variational_denominator / m.area_triangle
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


def test_pwl_quad_gradients():
    """PWL and Wachspress agree on linear-reproduction integrals for quads."""
    m, vb_w = _quad_mesh_basis("wachspress")
    _, vb_p = _quad_mesh_basis("pwl")
    # both must integrate d(phi_g)/dx over the cell identically (exact for
    # any basis reproducing linears with the same boundary trace)
    np.testing.assert_allclose(vb_p.basis_integrals_u.sum(axis=1),
                               vb_w.basis_integrals_u.sum(axis=1),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(vb_p.basis_gradient_u.sum(axis=1), 0.0,
                               atol=1e-12)
