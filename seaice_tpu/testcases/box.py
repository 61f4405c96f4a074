"""The Hunke EVP box test.

Planar square domain with an analytic rotating wind field, a circular
ocean current, and a linear ice-concentration ramp — the standard EVP
validation case (reference: mpas_seaice_testing.F:230-537 and
testing_and_setup/testcases/square/square_quadhex/create_ics.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as c
from ..mesh import Mesh, planar_quad_mesh, planar_hex_mesh
from ..dynamics.evp import DynamicsForcing

BOX_LX = 1.28e6
BOX_LY = 1.28e6

# Barrow, AK reference position for the Coriolis parameter
# (reference mpas_seaice_testing.F:557-563)
_BARROW_LAT_DEG = 71.35
_DIST_TO_DEG = c.RADIANS_TO_DEGREES / 6.37e6
_OMEGA_BOX = 7.292e-5


def box_test_mesh(nx: int = 80, ny: int = 80, hex_mesh: bool = False) -> Mesh:
    """Bounded planar mesh covering the [0, BOX_LX]^2 box."""
    if hex_mesh:
        dc = BOX_LX / nx
        return planar_hex_mesh(nx, ny, dc, periodic=False)
    dc = BOX_LX / nx
    return planar_quad_mesh(nx, ny, dc, periodic=False)


def box_wind(x, y, t: float):
    """Analytic wind (reference init_square_test_case_atmos,
    testing.F:357-422): u = a + (sin(2 pi t / tau) - b) sin(2 pi x/Lx)
    sin(pi y/Ly), and symmetrically for v."""
    a, b = 5.0, 3.0
    tau = 4.0 * 24.0 * 3600.0
    s = np.sin(2.0 * np.pi * t / tau)
    u = a + (s - b) * np.sin(2 * np.pi * x / BOX_LX) * \
        np.sin(np.pi * y / BOX_LY)
    v = a + (s - b) * np.sin(2 * np.pi * y / BOX_LY) * \
        np.sin(np.pi * x / BOX_LX)
    return u, v


def box_ocean_currents(x, y):
    """Rotating ocean current (reference init_square_test_case_ocean,
    testing.F:311-343)."""
    a = 0.1
    u = a * ((2.0 * y - BOX_LY) / BOX_LY)
    v = -a * ((2.0 * x - BOX_LX) / BOX_LX)
    return u, v


def box_coriolis_parameter(mesh: Mesh) -> np.ndarray:
    """f at vertices from the Barrow-anchored latitude mapping
    (reference square_test_correct_positions, testing.F:539-628)."""
    lat_deg = mesh.y_vertex * _DIST_TO_DEG + _BARROW_LAT_DEG
    return 2.0 * _OMEGA_BOX * np.sin(np.deg2rad(lat_deg))


def box_initial_state(mesh: Mesh, n_categories: int = 1,
                      ice_thickness: float = 2.0):
    """Linear concentration ramp a = clamp(x/Lx, 0, 1), h = 2 m
    (reference init_square_test_case_state, testing.F:436-525).

    Returns (ice_area_cat, ice_volume_cat, snow_volume_cat), each
    [nCells, nCategories] numpy.
    """
    conc = np.clip(mesh.x_cell / BOX_LX, 0.0, 1.0)
    area = np.repeat(conc[:, None], n_categories, axis=1) / 1.0
    # reference puts the full ramp in every category
    vol = ice_thickness * area
    snow = np.zeros_like(area)
    return area, vol, snow


def box_forcing(mesh: Mesh, t: float, dtype=jnp.float64) -> DynamicsForcing:
    uw, vw = box_wind(mesh.x_cell, mesh.y_cell, t)
    uo, vo = box_ocean_currents(mesh.x_cell, mesh.y_cell)
    nc = mesh.n_cells
    return DynamicsForcing(
        u_air_velocity=jnp.asarray(uw, dtype),
        v_air_velocity=jnp.asarray(vw, dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=jnp.asarray(uo, dtype),
        v_ocean_velocity=jnp.asarray(vo, dtype),
        sea_surface_tilt_u=jnp.zeros((nc,), dtype),
        sea_surface_tilt_v=jnp.zeros((nc,), dtype),
        land_ice_mask=jnp.zeros((nc,), dtype),
    )
