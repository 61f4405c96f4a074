"""Spherical mesh + spherical operators (reference spherical_operators
testcases; mesh self-tests seaice_test_rotation / mesh conversions,
mpas_seaice_mesh.F:2994,3294)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu import constants as c
from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig, \
    AdvectionConfig, AdvectionType, ColumnConfig
from seaice_tpu.mesh import (icosahedral_mesh,
                             latlon_vector_rotation_forward,
                             latlon_vector_rotation_reverse)
from seaice_tpu.model import SeaIceModel


@pytest.fixture(scope="module")
def sphere():
    return icosahedral_mesh(subdivisions=3)


def test_icosahedral_mesh_topology(sphere):
    m = sphere
    # Euler: V - E + F = 2 for the polyhedron (cells = faces of the dual)
    assert m.n_cells - m.n_edges + m.n_vertices == 2
    # 12 pentagons, rest hexagons
    n_pent = int((m.n_edges_on_cell == 5).sum())
    n_hex = int((m.n_edges_on_cell == 6).sum())
    assert n_pent == 12 and n_pent + n_hex == m.n_cells
    # total area = 4 pi R^2
    np.testing.assert_allclose(m.area_cell.sum(),
                               4.0 * np.pi * m.sphere_radius ** 2,
                               rtol=1e-6)
    # every vertex interior (closed surface)
    assert (m.interior_vertex == 1).all()
    # dual triangles tile the sphere too
    np.testing.assert_allclose(m.area_triangle.sum(),
                               4.0 * np.pi * m.sphere_radius ** 2,
                               rtol=1e-6)


def test_latlon_vector_rotation_roundtrip(sphere):
    m = sphere
    rng = np.random.RandomState(0)
    u = rng.randn(m.n_vertices)
    v = rng.randn(m.n_vertices)
    # avoid the exact poles where east/north is undefined
    ok = np.abs(np.abs(m.lat_vertex) - np.pi / 2) > 0.05
    ur, vr = latlon_vector_rotation_forward(u, v, m.x_vertex,
                                            m.y_vertex, m.z_vertex)
    u2, v2 = latlon_vector_rotation_reverse(ur, vr, m.x_vertex,
                                            m.y_vertex, m.z_vertex)
    np.testing.assert_allclose(u2[ok], u[ok], atol=1e-10)
    np.testing.assert_allclose(v2[ok], v[ok], atol=1e-10)
    # rotation preserves speed
    np.testing.assert_allclose(ur**2 + vr**2, u**2 + v**2, rtol=1e-10)


def _solid_body_strain_error(subdivisions: int) -> float:
    """Max |strain| for a strain-free solid-body rotation field, away
    from the rotated-pole coordinate singularity (which the grid
    rotation parks on the ice-free true equator; the reference has the
    identical singularity)."""
    from seaice_tpu.dynamics import variational
    from seaice_tpu.dynamics.evp import build_dynamics_tensors
    from seaice_tpu.mesh.rotation import grid_rotation_forward

    m = icosahedral_mesh(subdivisions)
    cfg = Config(velocity=VelocitySolverConfig(
        rotate_cartesian_grid=True, include_metric_terms=True))
    dyn = build_dynamics_tensors(m, cfg, dtype=jnp.float64)

    omega = 1.0e-6
    u_true = omega * m.sphere_radius * np.cos(m.lat_vertex)
    v_true = np.zeros(m.n_vertices)
    u_rot, v_rot = latlon_vector_rotation_forward(
        u_true, v_true, m.x_vertex, m.y_vertex, m.z_vertex)

    e11, e22, e12 = variational.strain_tensor(
        jnp.asarray(u_rot), jnp.asarray(v_rot), dyn.tan_lat_vertex,
        dyn.mesh, dyn.basis_gradient_u, dyn.basis_gradient_v)
    xr, yr, zr = grid_rotation_forward(m.x_cell, m.y_cell, m.z_cell)
    lat_rot = np.arcsin(np.clip(zr / m.sphere_radius, -1.0, 1.0))
    away = (np.pi / 2 - np.abs(lat_rot)) > 0.5
    err_cell = np.maximum(
        np.maximum(np.abs(np.asarray(e11)), np.abs(np.asarray(e22))),
        2.0 * np.abs(np.asarray(e12))).max(axis=1)
    return float(err_cell[away].max()) / omega


def test_solid_body_rotation_strain_converges():
    """Solid-body rotation is strain-free: the discrete strain must be
    small relative to the velocity-gradient scale AND converge under
    refinement (the reference's spherical_operators scaling strategy)."""
    e3 = _solid_body_strain_error(3)    # ~885 km cells
    e4 = _solid_body_strain_error(4)    # ~440 km cells
    assert e3 < 1.0, e3                 # bounded at coarsest resolution
    assert e4 < e3 / 1.7, (e3, e4)      # converging under refinement


def _solid_body_strain_error_weak(subdivisions: int) -> float:
    """Weak-scheme analog of _solid_body_strain_error (reference
    spherical_operators strain testcase run with
    config_strain_scheme='weak')."""
    from seaice_tpu.dynamics.weak import build_weak_tensors, \
        strain_tensor_weak
    from seaice_tpu.mesh.rotation import grid_rotation_forward

    m = icosahedral_mesh(subdivisions)
    wk = build_weak_tensors(m, jnp.float64, rotate_cartesian_grid=True)
    mt = m.tensors(jnp.float64)

    omega = 1.0e-6
    u_true = omega * m.sphere_radius * np.cos(m.lat_vertex)
    v_true = np.zeros(m.n_vertices)
    u_rot, v_rot = latlon_vector_rotation_forward(
        u_true, v_true, m.x_vertex, m.y_vertex, m.z_vertex)

    ss = jnp.ones((m.n_cells,))
    e11, e22, e12 = strain_tensor_weak(
        wk, mt, jnp.asarray(u_rot), jnp.asarray(v_rot),
        jnp.asarray(m.area_cell), ss)
    xr, yr, zr = grid_rotation_forward(m.x_cell, m.y_cell, m.z_cell)
    lat_rot = np.arcsin(np.clip(zr / m.sphere_radius, -1.0, 1.0))
    away = (np.pi / 2 - np.abs(lat_rot)) > 0.5
    err = np.maximum(
        np.maximum(np.abs(np.asarray(e11)), np.abs(np.asarray(e22))),
        2.0 * np.abs(np.asarray(e12)))
    return float(err[away].max()) / omega


def test_weak_solid_body_strain_converges():
    """The weak (line-integral) scheme's spherical normal vectors: a
    strain-free solid-body rotation must give small discrete strain,
    converging under refinement."""
    e3 = _solid_body_strain_error_weak(3)
    e4 = _solid_body_strain_error_weak(4)
    assert e3 < 1.0, e3
    assert e4 < e3 / 1.7, (e3, e4)


def test_weak_evp_step_on_sphere(sphere):
    """Full weak-scheme EVP step on the global mesh runs and stays
    bounded (spherical normal vectors + metric terms end-to-end)."""
    from seaice_tpu.config import StrainScheme, StressDivergenceScheme
    m = sphere
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=8, rotate_cartesian_grid=True,
            include_metric_terms=True, geostrophic_surface_tilt=False,
            strain_scheme=StrainScheme.WEAK,
            stress_divergence_scheme=StressDivergenceScheme.WEAK),
        advection=AdvectionConfig(advection_type=AdvectionType.UPWIND),
        column=ColumnConfig(use_column_package=False))
    model = SeaIceModel(m, cfg, dtype=jnp.float64)

    polar = np.abs(m.lat_cell) > np.deg2rad(60.0)
    area = np.where(polar, 0.9, 0.0)[:, None]
    vol = area * 2.0
    state = model.init_state(area, vol, np.zeros_like(area))

    u_true = np.full(m.n_cells, 5.0)
    v_true = np.zeros(m.n_cells)
    u_rot, v_rot = latlon_vector_rotation_forward(
        u_true, v_true, m.x_cell, m.y_cell, m.z_cell)

    from seaice_tpu.dynamics.evp import DynamicsForcing
    nc = m.n_cells
    z = jnp.zeros((nc,), jnp.float64)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(u_rot),
        v_air_velocity=jnp.asarray(v_rot),
        air_density=jnp.full((nc,), 1.3), u_ocean_velocity=z,
        v_ocean_velocity=z, sea_surface_tilt_u=z, sea_surface_tilt_v=z,
        land_ice_mask=z)

    step = model.make_step()
    for _ in range(3):
        state, diags = step(model.tensors, state, forcing)
    u = np.asarray(state.velocity.u_velocity)
    assert np.isfinite(u).all()
    assert 0.0 < np.abs(u).max() < 1.0


def test_evp_step_on_sphere(sphere):
    """EVP + upwind transport runs stably on the global mesh with polar
    ice caps and zonal wind."""
    m = sphere
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=8, rotate_cartesian_grid=True,
            include_metric_terms=True, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(advection_type=AdvectionType.UPWIND),
        column=ColumnConfig(use_column_package=False))
    model = SeaIceModel(m, cfg, dtype=jnp.float64)

    polar = np.abs(m.lat_cell) > np.deg2rad(60.0)
    area = np.where(polar, 0.9, 0.0)[:, None]
    vol = area * 2.0
    state = model.init_state(area, vol, np.zeros_like(area))

    # 5 m/s zonal wind, rotated into the grid frame
    u_true = np.full(m.n_cells, 5.0)
    v_true = np.zeros(m.n_cells)
    u_rot, v_rot = latlon_vector_rotation_forward(
        u_true, v_true, m.x_cell, m.y_cell, m.z_cell)

    from seaice_tpu.dynamics.evp import DynamicsForcing
    nc = m.n_cells
    z = jnp.zeros((nc,), jnp.float64)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(u_rot), v_air_velocity=jnp.asarray(
            v_rot),
        air_density=jnp.full((nc,), 1.3), u_ocean_velocity=z,
        v_ocean_velocity=z, sea_surface_tilt_u=z, sea_surface_tilt_v=z,
        land_ice_mask=z)

    step = model.make_step()
    a0 = float((state.tracers["iceAreaCategory"].sum(-1) *
                model.tensors.area_cell).sum())
    for _ in range(3):
        state, diags = step(model.tensors, state, forcing)
    u = np.asarray(state.velocity.u_velocity)
    a = np.asarray(state.tracers["iceAreaCategory"])
    assert np.isfinite(u).all() and np.isfinite(a).all()
    assert 0.0 < np.abs(u).max() < 1.0
    a1 = float((state.tracers["iceAreaCategory"].sum(-1) *
                model.tensors.area_cell).sum())
    # closed sphere: upwind transport conserves total area exactly
    np.testing.assert_allclose(a1, a0, rtol=1e-12)


def test_spherical_incremental_remap():
    """IR transport on the sphere: machine-precision conservation of all
    mass*tracer products, monotone tracers, and preservation of the mass
    z-centroid under solid-body rotation about the z axis."""
    from seaice_tpu.transport import (build_remap_geometry,
                                      standard_tracer_tree,
                                      make_remap_step,
                                      global_conserved_sums)

    m = icosahedral_mesh(3)
    tree = standard_tracer_tree(n_ice_layers=2, n_snow_layers=1)
    rt = build_remap_geometry(m, rotate_cartesian_grid=True).tensors()
    mt = m.tensors(jnp.float64)
    step = jax.jit(make_remap_step(tree, m.vertex_degree))

    nc, ncat = m.n_cells, 2
    polar = np.abs(m.lat_cell) > np.deg2rad(55.0)
    area = np.where(polar[:, None],
                    0.5 + 0.2 * np.cos(3 * m.lon_cell)[:, None],
                    0.0) * np.ones((1, ncat))
    area = np.clip(area, 0, 1)
    has0 = area[..., None] > 0
    tsfc = np.where(area > 0, -8.0 + np.sin(m.lon_cell)[:, None], 0.0)
    state = {
        "iceAreaCategory": jnp.asarray(area),
        "iceVolumeCategory": jnp.asarray(area * 2.0),
        "snowVolumeCategory": jnp.asarray(area * 0.1),
        "surfaceTemperature": jnp.asarray(tsfc),
        "iceEnthalpy": jnp.asarray(-2e8 * np.ones((nc, ncat, 2))) * has0,
        "iceSalinity": jnp.asarray(4.0 * np.ones((nc, ncat, 2))) * has0,
        "snowEnthalpy": jnp.asarray(-1e8 * np.ones((nc, ncat, 1))) * has0,
    }
    # solid-body rotation about the true z axis
    from seaice_tpu.mesh.rotation import latlon_vector_rotation_forward \
        as rot_fwd
    omega_rot = 2e-7
    u_t = omega_rot * m.sphere_radius * np.cos(m.lat_vertex)
    u, v = rot_fwd(u_t, np.zeros(m.n_vertices),
                   m.x_vertex, m.y_vertex, m.z_vertex)
    u, v = jnp.asarray(u), jnp.asarray(v)
    ac = jnp.asarray(m.area_cell)
    s0 = global_conserved_sums(tree, state, ac)
    zc0 = float((state["iceAreaCategory"].sum(-1) * ac *
                 jnp.asarray(m.z_cell)).sum() /
                (state["iceAreaCategory"].sum(-1) * ac).sum())
    for _ in range(8):
        state = step(rt, mt.cells_on_cell, mt.cells_on_cell_mask, ac,
                     state, u, v, 1800.0)
    s1 = global_conserved_sums(tree, state, ac)
    for k in s0:
        rel = abs(float(s1[k] - s0[k])) / max(abs(float(s0[k])), 1e-300)
        assert rel < 1e-11, (k, rel)
    a = np.asarray(state["iceAreaCategory"])
    t = np.asarray(state["surfaceTemperature"])
    assert np.isfinite(a).all() and a.min() >= -1e-12
    has = a > 1e-11
    assert t[has].min() >= tsfc.min() - 1e-6
    assert t[has].max() <= 1e-9
    # zonal solid-body rotation must not move mass meridionally
    zc1 = float((state["iceAreaCategory"].sum(-1) * ac *
                 jnp.asarray(m.z_cell)).sum() /
                (state["iceAreaCategory"].sum(-1) * ac).sum())
    assert abs(zc1 - zc0) / m.sphere_radius < 2e-4, (zc0, zc1)


def _remap_rotation_error(subdivisions: int, n_steps: int) -> float:
    """Area-weighted L1 error of IR transport of a smooth bump under
    solid-body rotation vs the analytically rotated field (reference
    testcases/advection error-convergence strategy,
    advection_error_convergence.py)."""
    from seaice_tpu.transport import (build_remap_geometry,
                                      standard_tracer_tree,
                                      make_remap_step)
    from seaice_tpu.mesh.rotation import latlon_vector_rotation_forward \
        as rot_fwd

    m = icosahedral_mesh(subdivisions)
    tree = standard_tracer_tree(n_ice_layers=1, n_snow_layers=1)
    rt = build_remap_geometry(m, rotate_cartesian_grid=True).tensors()
    mt = m.tensors(jnp.float64)
    # unlimited reconstruction: the monotone limiter clips extrema and
    # is locally 1st-order there; the formal-order study runs without it
    step = jax.jit(make_remap_step(tree, m.vertex_degree,
                                   monotonic=False))

    theta_total = np.deg2rad(12.0)       # same physical displacement
    omega_rot = 2e-7
    dt = theta_total / (omega_rot * n_steps)

    def bump(lon_center):
        # great-circle distance to a center on the equator
        c = np.array([np.cos(lon_center), np.sin(lon_center), 0.0])
        p = np.stack([m.x_cell, m.y_cell, m.z_cell],
                     axis=-1) / m.sphere_radius
        d = np.arccos(np.clip(p @ c, -1.0, 1.0))
        return 0.1 + 0.5 * np.exp(-(d / 0.45) ** 2)

    nc = m.n_cells
    a0 = bump(0.0)[:, None]
    has = a0[..., None] > 0
    state = {
        "iceAreaCategory": jnp.asarray(a0),
        "iceVolumeCategory": jnp.asarray(a0 * 2.0),
        "snowVolumeCategory": jnp.asarray(a0 * 0.1),
        "surfaceTemperature": jnp.asarray(-5.0 * (a0 > 0)),
        "iceEnthalpy": jnp.asarray(-2e8 * np.ones((nc, 1, 1))) * has,
        "iceSalinity": jnp.asarray(4.0 * np.ones((nc, 1, 1))) * has,
        "snowEnthalpy": jnp.asarray(-1e8 * np.ones((nc, 1, 1))) * has,
    }
    u_t = omega_rot * m.sphere_radius * np.cos(m.lat_vertex)
    u, v = rot_fwd(u_t, np.zeros(m.n_vertices),
                   m.x_vertex, m.y_vertex, m.z_vertex)
    u, v = jnp.asarray(u), jnp.asarray(v)
    ac = jnp.asarray(m.area_cell)
    for _ in range(n_steps):
        state = step(rt, mt.cells_on_cell, mt.cells_on_cell_mask, ac,
                     state, u, v, dt)
    exact = bump(theta_total)
    got = np.asarray(state["iceAreaCategory"][:, 0])
    w = np.asarray(m.area_cell)
    return float((np.abs(got - exact) * w).sum() /
                 (np.abs(exact) * w).sum())


def test_spherical_remap_accuracy_converges():
    """IR transport is formally 2nd-order in space: refining the mesh
    must shrink the solid-body-advection error accordingly (the
    reference's advection error-convergence testcase, run on the
    sphere).

    The departure points are straight-line backward trajectories
    (-u*dt, same as the reference, incremental_remap.F:5255), whose
    trajectory-curvature error is O(dt); the study therefore scales
    dt ~ h^2 (n: 10 -> 40 for one subdivision) so the temporal and
    spatial terms refine together.  Measured decomposition at subdiv
    3/4: spatial component ratio ~4.2 (2nd order), temporal ~C/n."""
    e3 = _remap_rotation_error(3, 10)
    e4 = _remap_rotation_error(4, 40)
    assert e3 < 0.05, e3
    assert e4 < e3 / 3.0, (e3, e4, e3 / e4)


def test_spherical_full_model_with_remap():
    """Full model step on the sphere with IR transport enabled."""
    from seaice_tpu.dynamics.evp import DynamicsForcing

    m = icosahedral_mesh(3)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=6, rotate_cartesian_grid=True,
            include_metric_terms=True, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(
            advection_type=AdvectionType.INCREMENTAL_REMAP),
        column=ColumnConfig(use_column_package=False))
    model = SeaIceModel(m, cfg, dtype=jnp.float64)
    polar = np.abs(m.lat_cell) > np.deg2rad(60.0)
    area = np.where(polar, 0.9, 0.0)[:, None]
    state = model.init_state(area, area * 2.0, np.zeros_like(area))
    u_rot, v_rot = latlon_vector_rotation_forward(
        np.full(m.n_cells, 5.0), np.zeros(m.n_cells),
        m.x_cell, m.y_cell, m.z_cell)
    nc = m.n_cells
    z = jnp.zeros((nc,), jnp.float64)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(u_rot),
        v_air_velocity=jnp.asarray(v_rot),
        air_density=jnp.full((nc,), 1.3), u_ocean_velocity=z,
        v_ocean_velocity=z, sea_surface_tilt_u=z,
        sea_surface_tilt_v=z, land_ice_mask=z)
    step = model.make_step()
    a0 = float((state.tracers["iceAreaCategory"].sum(-1) *
                model.tensors.area_cell).sum())
    for _ in range(3):
        state, _ = step(model.tensors, state, forcing)
    u = np.asarray(state.velocity.u_velocity)
    a1 = float((state.tracers["iceAreaCategory"].sum(-1) *
                model.tensors.area_cell).sum())
    assert np.isfinite(u).all() and 0 < np.abs(u).max() < 1.0
    np.testing.assert_allclose(a1, a0, rtol=1e-12)
    a = np.asarray(state.tracers["iceAreaCategory"])
    assert a.min() >= -1e-12
