"""Fused Pallas cell kernel (spherical panel meshes) vs the XLA
panel-shift oracle (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
from seaice_tpu.dynamics import variational_panel as vpn
from seaice_tpu.dynamics.evp import (DynamicsForcing,
                                     build_dynamics_tensors,
                                     init_velocity_state,
                                     make_velocity_solver)
from seaice_tpu.mesh import icosahedral_mesh
from seaice_tpu.mesh.panels import panel_reorder


def _problem(metric, subcycles=6):
    mesh, lay = panel_reorder(icosahedral_mesh(3), 3)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=subcycles,
            rotate_cartesian_grid=True,
            include_metric_terms=metric,
            geostrophic_surface_tilt=False))
    dtype = jnp.float32
    dyn = build_dynamics_tensors(mesh, cfg, dtype)
    nc, nv = mesh.n_cells, mesh.n_vertices
    rng = np.random.default_rng(0)
    area = jnp.asarray(0.8 * np.ones((nc, 1)), dtype)
    vol = jnp.asarray(1.5 * np.ones((nc, 1)), dtype)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(
            5.0 * rng.standard_normal(nc), dtype),
        v_air_velocity=jnp.asarray(
            2.0 * rng.standard_normal(nc), dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        v_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        sea_surface_tilt_u=jnp.zeros((nc,), dtype),
        sea_surface_tilt_v=jnp.zeros((nc,), dtype),
        land_ice_mask=jnp.zeros((nc,), dtype))
    state = init_velocity_state(mesh, dtype)
    return mesh, lay, cfg, dyn, area, vol, forcing, state


@pytest.mark.parametrize("metric", [False, True])
def test_pallas_panel_matches_xla(metric):
    """One velocity solve (6 subcycles) through the fused Pallas cell
    kernel must match the XLA panel path to f32 reassociation
    tolerance."""
    mesh, lay, cfg, dyn, area, vol, forcing, state = _problem(metric)

    solver_ref = make_velocity_solver(cfg, min_dv_edge=float(
        np.min(mesh.dv_edge[mesh.dv_edge > 0])), panel_n=lay.N,
        use_pallas=False)
    snow = jnp.zeros_like(vol)
    out_ref, diag_ref = solver_ref(dyn, state, forcing, area, vol,
                                   snow)

    solver_pl = make_velocity_solver(cfg, min_dv_edge=float(
        np.min(mesh.dv_edge[mesh.dv_edge > 0])), panel_n=lay.N,
        use_pallas=True)
    out_pl, diag_pl = solver_pl(dyn, state, forcing, area, vol,
                                snow)

    u_r = np.asarray(out_ref.u_velocity)
    u_p = np.asarray(out_pl.u_velocity)
    scale = max(np.abs(u_r).max(), 1e-12)
    np.testing.assert_allclose(u_p, u_r, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_pl.v_velocity),
                               np.asarray(out_ref.v_velocity),
                               atol=2e-5 * scale)
    for f in ("stress11", "stress22", "stress12"):
        a = np.asarray(getattr(out_ref, f))
        b = np.asarray(getattr(out_pl, f))
        s = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, atol=2e-5 * s, err_msg=f)
