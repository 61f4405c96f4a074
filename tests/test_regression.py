"""Pinned-output regression test.

The analog of the reference's regression.py (dev checkout vs base
checkout, bitwise restart comparison): the 12-hour box-test trajectory
is pinned in tests/data_regression_box.npz; any numerics change that
alters the solution beyond tight tolerances must consciously regenerate
the baseline (see the generation snippet in the git history).
"""

import os

import numpy as np
import jax.numpy as jnp

from seaice_tpu.config import box_test_config
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box

BASELINE = os.path.join(os.path.dirname(__file__),
                        "data_regression_box.npz")


def test_box_12h_regression():
    cfg = box_test_config(elastic_subcycles=120)
    mesh = box.box_test_mesh(20, 20)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, 1)
    state = model.init_state(area, vol, snow)
    step = model.make_step()
    n = int(12 * 3600 / cfg.run.dt)
    for i in range(n):
        forcing = box.box_forcing(mesh, i * cfg.run.dt)
        state, _ = step(model.tensors, state, forcing)

    ref = np.load(BASELINE)
    np.testing.assert_allclose(np.asarray(state.velocity.u_velocity),
                               ref["u"], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.velocity.v_velocity),
                               ref["v"], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(state.tracers["iceAreaCategory"]), ref["area"],
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(state.tracers["iceVolumeCategory"]), ref["vol"],
        rtol=1e-10, atol=1e-12)


def test_sphere_full_physics_regression():
    """Pinned 3-step full-physics trajectory on the panel-reordered
    icosahedral mesh (mushy + dEdd + lvl ponds + Rothrock + IR +
    metric terms) — guards the spherical kernels, the panel layout,
    and the mesh generator against silent numerics drift."""
    from seaice_tpu.config import (AdvectionConfig, ColumnConfig,
                                   Config, RunConfig,
                                   VelocitySolverConfig)
    from seaice_tpu.dynamics.evp import DynamicsForcing
    from seaice_tpu.mesh import icosahedral_mesh
    from seaice_tpu.mesh.panels import panel_reorder
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.utils.pytree import replace
    import jax

    mesh, lay = panel_reorder(icosahedral_mesh(3), 3)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=3, n_ice_layers=4),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=8, rotate_cartesian_grid=True,
            include_metric_terms=True, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(),
        column=ColumnConfig(ktherm=2, shortwave="dEdd",
                            pond_scheme="lvl", kstrength=1))
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    (area, vol, snow, extra, atm, ocn, coszen) = full_physics_inputs(
        mesh, cfg, jnp.float64)
    state = model.init_state(area, vol, snow)
    tr = dict(state.tracers)
    tr.update({k: jnp.asarray(v) for k, v in extra.items()})
    state = replace(state, tracers=tr)
    step = model.make_step()
    nc = mesh.n_cells
    rng = np.random.default_rng(7)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(5 * rng.standard_normal(nc)),
        v_air_velocity=jnp.asarray(2 * rng.standard_normal(nc)),
        air_density=jnp.full((nc,), 1.3),
        u_ocean_velocity=jnp.asarray(0.05 * rng.standard_normal(nc)),
        v_ocean_velocity=jnp.asarray(0.05 * rng.standard_normal(nc)),
        sea_surface_tilt_u=jnp.zeros((nc,)),
        sea_surface_tilt_v=jnp.zeros((nc,)),
        land_ice_mask=jnp.zeros((nc,)))
    atm_j = jax.tree.map(jnp.asarray, atm)
    ocn_j = jax.tree.map(jnp.asarray, ocn)
    for _ in range(3):
        state, _ = step(model.tensors, state, forcing, atm_j, ocn_j,
                        coszen=jnp.asarray(coszen))
    ref = np.load(os.path.join(os.path.dirname(__file__),
                               "data_regression_sphere.npz"))
    np.testing.assert_allclose(np.asarray(state.velocity.u_velocity),
                               ref["u"], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.velocity.v_velocity),
                               ref["v"], rtol=1e-10, atol=1e-12)
    for name, key in (("iceAreaCategory", "area"),
                      ("iceVolumeCategory", "vol"),
                      ("surfaceTemperature", "tsfc")):
        np.testing.assert_allclose(
            np.asarray(state.tracers[name]), ref[key],
            rtol=1e-10, atol=1e-12, err_msg=name)
