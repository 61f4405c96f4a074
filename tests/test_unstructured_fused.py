"""Fused unstructured EVP kernel: plan correctness + trajectory
equivalence against the XLA gather path (interpret mode)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from seaice_tpu.mesh import icosahedral_mesh, spherical_voronoi_mesh


def _problem(mesh, metric, subcycles, dtype):
    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
    from seaice_tpu.dynamics.evp import (DynamicsForcing,
                                         build_dynamics_tensors,
                                         init_velocity_state)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=subcycles,
            rotate_cartesian_grid=True,
            include_metric_terms=metric,
            geostrophic_surface_tilt=False))
    dyn = build_dynamics_tensors(mesh, cfg, dtype)
    nc = mesh.n_cells
    rng = np.random.default_rng(0)
    area = np.clip(rng.uniform(-0.3, 0.95, (nc, 1)), 0.0, 1.0)
    vol = area * rng.uniform(0.5, 2.5, (nc, 1))
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(5.0 * rng.standard_normal(nc), dtype),
        v_air_velocity=jnp.asarray(2.0 * rng.standard_normal(nc), dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        v_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        sea_surface_tilt_u=jnp.zeros((nc,), dtype),
        sea_surface_tilt_v=jnp.zeros((nc,), dtype),
        land_ice_mask=jnp.zeros((nc,), dtype))
    state = init_velocity_state(mesh, dtype)
    return (cfg, dyn, jnp.asarray(area, dtype), jnp.asarray(vol, dtype),
            forcing, state)


def test_plan_window_maps_are_a_gather():
    """Replaying (wrow, ksel, rlane) in NumPy reproduces the plain
    voc/cov gathers for every valid target."""
    mesh = spherical_voronoi_mesh(3)
    from seaice_tpu.config import Config, VelocitySolverConfig
    from seaice_tpu.dynamics.evp import build_dynamics_tensors
    cfg = Config(velocity=VelocitySolverConfig(
        rotate_cartesian_grid=True, include_metric_terms=True))
    dyn = build_dynamics_tensors(mesh, cfg, jnp.float64)
    plan = dyn.unstructured
    assert plan is not None
    m = plan.meta

    rng = np.random.RandomState(0)
    u = rng.randn(mesh.n_vertices)
    # vertex plane in plan order
    up = np.zeros(m.r_v * 128)
    up[:m.nv] = u[np.asarray(plan.vertex_perm)]
    up = up.reshape(m.r_v, 128)

    from seaice_tpu.dynamics.gather_plan import CG
    wrow = np.asarray(plan.wrow)
    ksel = np.asarray(plan.ksel)
    rlane = np.asarray(plan.rlane)
    got = np.zeros((m.ngc, CG * 8, 128))
    for s in range(m.ngc):
        for k in range(wrow.shape[1]):
            sel = ksel[s] == k
            got[s][sel] = up[wrow[s, k]][rlane[s][sel]]

    # reference: voc gather in plan cell order
    voc = np.asarray(mesh.vertices_on_cell)
    neoc = np.asarray(mesh.n_edges_on_cell)
    valid = (np.arange(m.me)[None, :] < neoc[:, None]) & (voc >= 0)
    cp = np.asarray(plan.cell_perm)
    for c_new in range(m.nc):
        c_old = cp[c_new]
        chunk = c_new // 128
        for b in range(m.me):
            if valid[c_old, b]:
                want = u[voc[c_old, b]]
                have = got[chunk // CG, 8 * (chunk % CG) + b,
                           c_new % 128]
                assert have == want, (c_new, b)


@pytest.mark.parametrize("mesh_kind", ["voronoi", "icos"])
@pytest.mark.parametrize("metric", [False, True])
def test_fused_unstructured_matches_xla(mesh_kind, metric):
    """A full velocity solve through the fused unstructured kernel
    (interpret mode) must match the XLA gather path to reduction-order
    tolerance (f64: ~1e-11 relative)."""
    from seaice_tpu.dynamics.evp import make_velocity_solver
    dtype = jnp.float64
    mesh = (spherical_voronoi_mesh(3) if mesh_kind == "voronoi"
            else icosahedral_mesh(3))
    cfg, dyn, area, vol, forcing, state = _problem(
        mesh, metric, subcycles=6, dtype=dtype)
    mdv = float(np.min(mesh.dv_edge[mesh.dv_edge > 0]))
    snow = jnp.zeros_like(vol)

    solver_ref = make_velocity_solver(cfg, min_dv_edge=mdv,
                                      use_pallas=False)
    out_ref, _ = solver_ref(dyn, state, forcing, area, vol, snow)

    solver_fused = make_velocity_solver(
        cfg, min_dv_edge=mdv, use_pallas=True,
        unstructured_plan=dyn.unstructured)
    out_fused, _ = solver_fused(dyn, state, forcing, area, vol, snow)

    tol = 1e-11
    for f in ("u_velocity", "v_velocity", "stress11", "stress22",
              "stress12"):
        a = np.asarray(getattr(out_ref, f))
        b = np.asarray(getattr(out_fused, f))
        s = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, atol=tol * s, err_msg=f)


def test_fused_unstructured_via_model_flag():
    """The model engages the kernel when use_fused_unstructured=True
    and the trajectory matches the default (XLA) model step."""
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
    from seaice_tpu.config import ColumnConfig
    from seaice_tpu.dynamics.evp import DynamicsForcing
    from seaice_tpu.mesh.rotation import latlon_vector_rotation_forward

    mesh = spherical_voronoi_mesh(3)
    base = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=4,
            rotate_cartesian_grid=True, include_metric_terms=True,
            geostrophic_surface_tilt=False),
        column=ColumnConfig(use_column_package=False))
    on = dataclasses.replace(base, velocity=dataclasses.replace(
        base.velocity, use_fused_unstructured=True))

    nc = mesh.n_cells
    polar = np.abs(mesh.lat_cell) > np.deg2rad(60.0)
    area = np.where(polar, 0.9, 0.0)[:, None]
    u_rot, v_rot = latlon_vector_rotation_forward(
        np.full(nc, 5.0), np.zeros(nc),
        mesh.x_cell, mesh.y_cell, mesh.z_cell)
    z = jnp.zeros((nc,), jnp.float64)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(u_rot),
        v_air_velocity=jnp.asarray(v_rot),
        air_density=jnp.full((nc,), 1.3), u_ocean_velocity=z,
        v_ocean_velocity=z, sea_surface_tilt_u=z,
        sea_surface_tilt_v=z, land_ice_mask=z)

    outs = {}
    for name, cfg in (("ref", base), ("fused", on)):
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        state = model.init_state(area, area * 2.0,
                                 np.zeros_like(area))
        step = model.make_step()
        s2, _ = step(model.tensors, state, forcing)
        outs[name] = s2
    a = np.asarray(outs["ref"].velocity.u_velocity)
    b = np.asarray(outs["fused"].velocity.u_velocity)
    s = max(np.abs(a).max(), 1e-12)
    np.testing.assert_allclose(b, a, atol=1e-11 * s)


def test_sharded_fused_matches_single_device():
    """The SHARDED fused path (one kernel launch per subcycle, vertex
    halo exchange in plan coordinates between launches) reproduces the
    single-device trajectory on the virtual device mesh."""
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.parallel import ShardedSeaIceModel
    from seaice_tpu.testcases import box
    from seaice_tpu.config import box_test_config

    cfg = box_test_config(elastic_subcycles=4)
    cfg = dataclasses.replace(cfg, velocity=dataclasses.replace(
        cfg.velocity, use_fused_unstructured=True,
        use_pallas_subcycle=False))
    mesh = box.box_test_mesh(12, 12)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)

    # single-device reference: the plain XLA path (the raster mesh
    # keeps the single-device fused-unstructured plan out of scope)
    ref = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    rstate = ref.init_state(area, vol, snow)
    rstep = ref.make_step()
    forcing = box.box_forcing(mesh, t=0.0)
    rout, _ = rstep(ref.tensors, rstate, forcing)

    sm = ShardedSeaIceModel(mesh, cfg, 4, dtype=jnp.float64)
    assert sm.use_fused_unstructured
    assert sm.tensors.dynamics.unstructured is not None
    sstate = sm.init_state(area, vol, snow)
    sforcing = sm.scatter_forcing(lambda m: box.box_forcing(m, t=0.0))
    sstep = sm.make_step()
    sout, _ = sstep(sm.tensors, sm.halo, sstate, sforcing)

    u_s, v_s = sm.gather_velocity(sout)
    u_r = np.asarray(rout.velocity.u_velocity)
    np.testing.assert_allclose(u_s, u_r, atol=1e-12, rtol=1e-9)
    v_r = np.asarray(rout.velocity.v_velocity)
    np.testing.assert_allclose(v_s, v_r, atol=1e-12, rtol=1e-9)
