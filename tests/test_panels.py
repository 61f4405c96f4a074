"""Panel-shift kernels vs the gather path on icosahedral meshes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.config import Config, VelocitySolverConfig
from seaice_tpu.mesh import icosahedral_mesh
from seaice_tpu.mesh.panels import build_panel_layout, panel_reorder
from seaice_tpu.dynamics import variational_fast as vf
from seaice_tpu.dynamics import variational_panel as vp
from seaice_tpu.ops.basis import compute_variational_basis


def _setup(s, include_metric):
    mesh, lay = panel_reorder(icosahedral_mesh(s), s)
    vb = compute_variational_basis(
        mesh, basis_type="wachspress", integration_type="dunavant",
        integration_order=8, denominator_type="original",
        include_metric_terms=include_metric,
        rotate_cartesian_grid=True)
    ft = vf.build_fast_tensors(mesh, vb, jnp.float64)
    pt = vp.build_panel_tensors(mesh, lay, vb, jnp.float64)
    return mesh, lay, ft, pt


@pytest.mark.parametrize("metric", [False, True])
def test_panel_kernels_match_gather(metric):
    """strain + stress divergence via panel shifts must equal the
    voc_T/flat_corner_idx gather path (same contractions, corner axis
    permuted by slot) to roundoff."""
    s = 3
    mesh, lay, ft, pt = _setup(s, metric)
    nv, nc, me = mesh.n_vertices, mesh.n_cells, mesh.max_edges
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (nv,), jnp.float64)
    v = jax.random.normal(ks[1], (nv,), jnp.float64)
    sv = jnp.ones((nv,))

    eT = vf.strain_tensor_T(ft, u, v, metric)
    eP = vp.strain_tensor_P(pt, lay.N, u, v, metric)
    mask = np.asarray(ft.voc_mask_T)
    for a_T, a_P, name in zip(eT, eP, ("e11", "e22", "e12")):
        ring_back = vp.stress_slot_to_ring(pt, a_P)
        np.testing.assert_allclose(
            np.asarray(ring_back) * mask, np.asarray(a_T) * mask,
            atol=1e-12, err_msg=name)

    sr = [50.0 * jax.random.normal(ks[i], (me, nc), jnp.float64)
          * ft.voc_mask_T for i in (2, 3, 4)]
    dT = vf.stress_divergence_T(ft, *sr, sv, metric)
    ss = [vp.stress_ring_to_slot(pt, x) for x in sr]
    dP = vp.stress_divergence_P(pt, lay.N, *ss, sv, metric)
    scale = np.abs(np.asarray(dT[0])).max()
    np.testing.assert_allclose(np.asarray(dP[0]), np.asarray(dT[0]),
                               atol=1e-12 * scale)
    np.testing.assert_allclose(np.asarray(dP[1]), np.asarray(dT[1]),
                               atol=1e-12 * scale)


def test_ring_slot_roundtrip():
    s = 2
    mesh, lay, ft, pt = _setup(s, False)
    nc, me = mesh.n_cells, mesh.max_edges
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (me, nc), jnp.float64) * ft.voc_mask_T
    back = vp.stress_slot_to_ring(pt, vp.stress_ring_to_slot(pt, x))
    np.testing.assert_array_equal(
        np.asarray(back) * np.asarray(ft.voc_mask_T), np.asarray(x))


def test_panel_layout_invariants():
    s = 3
    mesh = icosahedral_mesh(s)
    lay = build_panel_layout(mesh, s)
    N = lay.N
    # bijective homes
    assert len(np.unique(lay.cell_slot)) == 10 * N * N
    assert len(np.unique(lay.vert_slot)) == mesh.n_vertices
    # ghost tables are O(N), not O(N^2)
    assert len(lay.ghost_vert_id) < 50 * N
    assert len(lay.ghost_pu_src) < 60 * N
    assert len(lay.exception_cells) == 12


def test_panel_model_step_matches_gather_path():
    """Full velocity-solver steps on a panel-reordered global mesh:
    the panel-shift path and the gather path produce the same
    trajectory (EVP + metric terms + upwind transport end-to-end)."""
    from seaice_tpu.config import (AdvectionConfig, AdvectionType,
                                   ColumnConfig, RunConfig)
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.mesh.rotation import latlon_vector_rotation_forward
    from seaice_tpu.dynamics.evp import DynamicsForcing
    import copy

    s = 3
    mesh, lay = panel_reorder(icosahedral_mesh(s), s)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=12, rotate_cartesian_grid=True,
            include_metric_terms=True, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(advection_type=AdvectionType.UPWIND),
        column=ColumnConfig(use_column_package=False))

    mesh_plain = copy.copy(mesh)
    if hasattr(mesh_plain, "panel_layout"):
        del mesh_plain.panel_layout

    states = {}
    for name, m in (("panel", mesh), ("gather", mesh_plain)):
        model = SeaIceModel(m, cfg, dtype=jnp.float64)
        assert (model.tensors.dynamics.panel is not None) == \
            (name == "panel")
        polar = np.abs(m.lat_cell) > np.deg2rad(55.0)
        area = np.where(polar, 0.9, 0.0)[:, None]
        state = model.init_state(area, area * 2.0,
                                 np.zeros_like(area))
        u_t = np.full(m.n_cells, 5.0)
        ur, vr = latlon_vector_rotation_forward(
            u_t, np.zeros(m.n_cells), m.x_cell, m.y_cell, m.z_cell)
        nc = m.n_cells
        z = jnp.zeros((nc,), jnp.float64)
        forcing = DynamicsForcing(
            u_air_velocity=jnp.asarray(ur),
            v_air_velocity=jnp.asarray(vr),
            air_density=jnp.full((nc,), 1.3),
            u_ocean_velocity=z, v_ocean_velocity=z,
            sea_surface_tilt_u=z, sea_surface_tilt_v=z,
            land_ice_mask=z)
        step = model.make_step()
        for _ in range(3):
            state, _ = step(model.tensors, state, forcing)
        states[name] = state

    u_p = np.asarray(states["panel"].velocity.u_velocity)
    u_g = np.asarray(states["gather"].velocity.u_velocity)
    scale = np.abs(u_g).max()
    assert scale > 1e-4
    np.testing.assert_allclose(u_p, u_g, atol=1e-11 * scale)
    np.testing.assert_allclose(
        np.asarray(states["panel"].velocity.v_velocity),
        np.asarray(states["gather"].velocity.v_velocity),
        atol=1e-11 * scale)
    np.testing.assert_allclose(
        np.asarray(states["panel"].tracers["iceAreaCategory"]),
        np.asarray(states["gather"].tracers["iceAreaCategory"]),
        atol=1e-12)
