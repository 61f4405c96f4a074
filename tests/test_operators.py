"""Operator accuracy tests mirroring the reference's operator testcases
(testing_and_setup/testcases/square/operators_strain and
operators_stress_divergence, with analytic fields from
mpas_seaice_testing.F:726-1057)."""

import numpy as np
import jax.numpy as jnp
import pytest

from seaice_tpu.config import Config
from seaice_tpu.dynamics.evp import build_dynamics_tensors
from seaice_tpu.dynamics import variational
from seaice_tpu.mesh import planar_hex_mesh, planar_quad_mesh


def _setup(mesh, basis="wachspress"):
    cfg = Config()
    cfg = cfg.replace(velocity=cfg.velocity.__class__(
        variational_basis=cfg.velocity.variational_basis.__class__(basis),
        include_metric_terms=False, rotate_cartesian_grid=False))
    dyn = build_dynamics_tensors(mesh, cfg, dtype=jnp.float64)
    return dyn


@pytest.mark.parametrize("mesh_kind", ["quad", "hex"])
@pytest.mark.parametrize("basis", ["wachspress", "pwl"])
def test_strain_exact_for_linear_velocity(mesh_kind, basis):
    """Linear velocity fields give exact constant strains
    (reference 'linearx'/'lineary'/'constantsig12' fields)."""
    if mesh_kind == "quad":
        mesh = planar_quad_mesh(8, 8, 1000.0, periodic=True)
    else:
        mesh = planar_hex_mesh(8, 8, 1000.0, periodic=True)
    dyn = _setup(mesh, basis)
    x = jnp.asarray(mesh.x_vertex)
    y = jnp.asarray(mesh.y_vertex)
    zero = jnp.zeros_like(x)
    tl = dyn.tan_lat_vertex

    # NOTE: periodic meshes break global linear fields across the seam, so
    # restrict the check to cells away from the seam
    lx = mesh.period_x
    ly = mesh.period_y
    margin = 2500.0
    interior = ((mesh.x_cell > margin) & (mesh.x_cell < lx - margin) &
                (mesh.y_cell > margin) & (mesh.y_cell < ly - margin))
    sel = np.nonzero(interior)[0]

    # u = x: e11 = 1, others 0
    e11, e22, e12 = variational.strain_tensor(
        x, zero, tl, dyn.mesh, dyn.basis_gradient_u, dyn.basis_gradient_v)
    mask = np.asarray(dyn.mesh.vertices_on_cell_mask[sel])
    np.testing.assert_allclose(np.asarray(e11[sel]) * mask, mask, atol=1e-9)
    np.testing.assert_allclose(np.asarray(e22[sel]) * mask, 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(e12[sel]) * mask, 0.0, atol=1e-9)

    # u = y, v = x: e12 = 1, others 0 ('constantsig12' scaled)
    e11, e22, e12 = variational.strain_tensor(
        y, x, tl, dyn.mesh, dyn.basis_gradient_u, dyn.basis_gradient_v)
    np.testing.assert_allclose(np.asarray(e12[sel]) * mask, mask, atol=1e-9)
    np.testing.assert_allclose(np.asarray(e11[sel]) * mask, 0.0, atol=1e-9)


@pytest.mark.parametrize("mesh_kind", ["quad", "hex"])
def test_stress_divergence_exact_for_linear_stress(mesh_kind):
    """Linear stress s11 = x gives the exact divergence (+1, 0) at interior
    vertices: the variational operator is
    divU = -(1/A_v) int s11 dphi_v/dx = +(1/A_v) int phi_v ds11/dx
    after integration by parts (phi_v vanishes on the patch boundary)."""
    if mesh_kind == "quad":
        mesh = planar_quad_mesh(10, 10, 1000.0, periodic=True)
    else:
        mesh = planar_hex_mesh(10, 10, 1000.0, periodic=True)
    dyn = _setup(mesh)

    # corner stresses: s11 at corner (c, k) = x of that vertex, evaluated
    # with the minimum-image local coordinate so the seam is consistent
    xc = mesh.x_cell[:, None] + mesh.x_local
    s11 = jnp.asarray(xc)
    s22 = jnp.zeros_like(s11)
    s12 = jnp.zeros_like(s11)
    solve = jnp.ones((mesh.n_vertices,))

    div_u, div_v = variational.stress_divergence(
        s11, s22, s12, dyn.tan_lat_vertex, dyn.mesh,
        dyn.basis_integrals_u, dyn.basis_integrals_v,
        dyn.basis_integrals_metric, dyn.variational_denominator, solve)

    # seam cells see a discontinuous x; exclude vertices near the seam
    margin = 2500.0
    lx, ly = mesh.period_x, mesh.period_y
    ok = ((mesh.x_vertex > margin) & (mesh.x_vertex < lx - margin) &
          (mesh.y_vertex > margin) & (mesh.y_vertex < ly - margin))
    np.testing.assert_allclose(np.asarray(div_u)[ok], 1.0, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(div_v)[ok], 0.0, atol=1e-9)


def test_strain_convergence_quadratic():
    """Quadratic velocity (u = x^2/2) strain error converges ~O(dc) at
    cell corners (reference operators_strain scaling analysis)."""
    errs = []
    for n in (8, 16, 32):
        dc = 1.0 / n
        mesh = planar_quad_mesh(n, n, dc, periodic=True)
        dyn = _setup(mesh)
        x = jnp.asarray(mesh.x_vertex)
        u = 0.5 * x * x
        e11, _, _ = variational.strain_tensor(
            u, jnp.zeros_like(u), dyn.tan_lat_vertex, dyn.mesh,
            dyn.basis_gradient_u, dyn.basis_gradient_v)
        # exact e11 = x at each corner
        xc = mesh.x_cell[:, None] + mesh.x_local
        margin = 3 * dc
        sel = ((mesh.x_cell > margin) & (mesh.x_cell < 1 - margin)).nonzero()[0]
        err = np.abs(np.asarray(e11)[sel] - xc[sel])
        errs.append(err.max())
    # first-order (or better) convergence
    assert errs[1] < 0.6 * errs[0]
    assert errs[2] < 0.6 * errs[1]
