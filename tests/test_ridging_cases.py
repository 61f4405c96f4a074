"""Ridging testcase analogs.

Ports of the reference's dedicated mechanical-redistribution setups
(`/root/reference/testing_and_setup/testcases/ridging_1D/` and
`ridging_island/`): wind drives the pack against a closed boundary
(1D case) or around a land island (island case), and ridging must
consume area into thicker categories under convergence while
conserving volume.  The reference validates these by inspecting the
thickness profile at days 1/5/30 (`plot_thicknesses.py`); here the
same behaviors are asserted: volume conservation, aice <= 1 under
convergence, thickness buildup at the convergence zone, and ridged
ice appearing in the thickest categories.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.config import (AdvectionConfig, AdvectionType,
                               ColumnConfig, Config, RunConfig,
                               VelocitySolverConfig)
from seaice_tpu.dynamics.evp import DynamicsForcing
from seaice_tpu.mesh import planar_quad_mesh
from seaice_tpu.model import SeaIceModel


def _cfg(ncat=5, subcycles=60, ridging=True):
    return Config(
        run=RunConfig(dt=1800.0, n_categories=ncat),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=subcycles,
            rotate_cartesian_grid=False,
            include_metric_terms=False,
            geostrophic_surface_tilt=False),
        advection=AdvectionConfig(
            advection_type=AdvectionType.INCREMENTAL_REMAP),
        column=ColumnConfig(
            use_column_package=True, use_shortwave=False,
            use_vertical_thermodynamics=False,
            use_itd_thermodynamics=False,
            use_ridging=ridging, use_ice_age=False,
            use_first_year_ice=False, kstrength=1))


def _wind_forcing(mesh, u_wind, land=None):
    nc = mesh.n_cells
    z = jnp.zeros((nc,), jnp.float64)
    return DynamicsForcing(
        u_air_velocity=jnp.full((nc,), u_wind, jnp.float64),
        v_air_velocity=z,
        air_density=jnp.full((nc,), 1.3, jnp.float64),
        u_ocean_velocity=z, v_ocean_velocity=z,
        sea_surface_tilt_u=z, sea_surface_tilt_v=z,
        land_ice_mask=(z if land is None
                       else jnp.asarray(land, jnp.float64)))


def _initial_state(model, aice=0.95, hi=0.5):
    ncat = model.cfg.run.n_categories
    nc = model.mesh.n_cells
    area = np.full((nc, ncat), 0.0)
    vol = np.zeros((nc, ncat))
    # all ice starts in category 1 (reference ridging ICs start thin
    # so redistribution into cat 2+ is observable)
    area[:, 0] = aice
    vol[:, 0] = aice * hi
    return model.init_state(area, vol, np.zeros_like(area))


def _run(model, state, forcing, n_steps):
    step = model.make_step()
    for _ in range(n_steps):
        state, _ = step(model.tensors, state, forcing)
    return state


def test_ridging_1d_wall():
    """Wind blows the pack against the +x wall (reference ridging_1D:
    100x50 10-km cells, 30 days; shrunk here): area is consumed into
    ridged categories at the wall, total volume is conserved, aice
    stays <= 1, and the thickness profile steepens toward the wall."""
    mesh = planar_quad_mesh(24, 5, 20e3, periodic=False)
    model = SeaIceModel(mesh, _cfg(), dtype=jnp.float64)
    state = _initial_state(model)
    forcing = _wind_forcing(mesh, 20.0)

    tr0 = state.tracers
    vol0 = float((tr0["iceVolumeCategory"].sum(-1) *
                  model.tensors.area_cell).sum())
    state = _run(model, state, forcing, 96)       # 2 days (dt=1800)
    tr = state.tracers
    aice = np.asarray(tr["iceAreaCategory"].sum(-1))
    vice = np.asarray(tr["iceVolumeCategory"].sum(-1))
    vol1 = float((tr["iceVolumeCategory"].sum(-1) *
                  model.tensors.area_cell).sum())

    # volume conservation (transport + ridging are conservative)
    np.testing.assert_allclose(vol1, vol0, rtol=1e-9)
    # ridging keeps concentration physical under convergence
    assert aice.max() <= 1.0 + 1e-9
    # the pack piles up downwind: mean thickness in the downwind
    # quarter exceeds the upwind quarter
    x = np.asarray(mesh.x_cell)
    h = np.where(aice > 0.01, vice / np.maximum(aice, 1e-12), 0.0)
    h_down = h[x > 0.75 * x.max()].mean()
    h_up = h[x < 0.25 * x.max()].mean()
    assert h_down > h_up * 1.08, (h_down, h_up)
    # ridged ice reaches thicker categories at the wall
    cat_area = np.asarray(tr["iceAreaCategory"])
    wall = x > 0.9 * x.max()
    assert cat_area[wall, 1:].sum() > 0.0
    # ice slows toward the wall (strength resists convergence)
    u = np.asarray(state.velocity.u_velocity)
    xv = np.asarray(mesh.x_vertex)
    u_wall = np.abs(u[xv > 0.9 * xv.max()]).mean()
    u_free = np.abs(u[(xv > 0.3 * xv.max()) & (xv < 0.5 * xv.max())]).mean()
    assert u_wall < u_free


def test_ridging_1d_no_ridging_violates_bounds():
    """Control: with ridging disabled the same convergent flow drives
    aice past 1 — demonstrating the redistribution is what enforces
    the bound (the reference validates mechred by this contrast)."""
    mesh = planar_quad_mesh(24, 5, 20e3, periodic=False)
    model = SeaIceModel(mesh, _cfg(ridging=False), dtype=jnp.float64)
    state = _initial_state(model)
    forcing = _wind_forcing(mesh, 20.0)
    state = _run(model, state, forcing, 96)
    aice = np.asarray(state.tracers["iceAreaCategory"].sum(-1))
    assert aice.max() > 1.0 + 1e-6


def test_ridging_island():
    """Flow past a land island (reference ridging_island): ice ridges
    on the upstream side of the island and thins in the wake; volume
    is conserved and aice stays bounded."""
    nx, ny = 24, 11
    mesh = planar_quad_mesh(nx, ny, 20e3, periodic=False)
    x = np.asarray(mesh.x_cell)
    y = np.asarray(mesh.y_cell)
    land = (((x > 0.5 * x.max()) & (x < 0.65 * x.max())) &
            ((y > 0.35 * y.max()) & (y < 0.65 * y.max()))).astype(float)
    model = SeaIceModel(mesh, _cfg(), dtype=jnp.float64)
    ncat = model.cfg.run.n_categories
    nc = mesh.n_cells
    area = np.zeros((nc, ncat))
    vol = np.zeros((nc, ncat))
    area[:, 0] = np.where(land > 0, 0.0, 0.95)
    vol[:, 0] = area[:, 0] * 0.5
    state = model.init_state(area, vol, np.zeros_like(area))
    forcing = _wind_forcing(mesh, 20.0, land=land)

    vol0 = float((state.tracers["iceVolumeCategory"].sum(-1) *
                  model.tensors.area_cell).sum())
    state = _run(model, state, forcing, 24)
    tr = state.tracers
    aice = np.asarray(tr["iceAreaCategory"].sum(-1))
    vice = np.asarray(tr["iceVolumeCategory"].sum(-1))
    vol1 = float((tr["iceVolumeCategory"].sum(-1) *
                  model.tensors.area_cell).sum())
    np.testing.assert_allclose(vol1, vol0, rtol=1e-9)
    assert aice.max() <= 1.0 + 1e-9

    ocean = land == 0
    mid = (y > 0.35 * y.max()) & (y < 0.65 * y.max()) & ocean
    h = np.where(aice > 0.01, vice / np.maximum(aice, 1e-12), 0.0)
    upstream = mid & (x > 0.35 * x.max()) & (x < 0.5 * x.max())
    wake = mid & (x > 0.65 * x.max()) & (x < 0.8 * x.max())
    assert h[upstream].mean() > h[wake].mean(), \
        (h[upstream].mean(), h[wake].mean())
