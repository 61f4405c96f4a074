"""Full-timestep driver tests (velocity solve + IR transport composed)."""

import numpy as np
import jax
import jax.numpy as jnp

from seaice_tpu.config import box_test_config
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box
from seaice_tpu.transport.remap import global_conserved_sums


def _tiny_model(subcycles=4, nx=12):
    cfg = box_test_config(elastic_subcycles=subcycles)
    mesh = box.box_test_mesh(nx, nx)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    forcing = box.box_forcing(mesh, t=0.0)
    return model, state, forcing


def test_full_step_runs_and_conserves():
    model, state, forcing = _tiny_model()
    step = model.make_step()
    ac = model.tensors.area_cell
    s0 = global_conserved_sums(model.tree, state.tracers, ac)
    out, diags = step(model.tensors, state, forcing)
    s1 = global_conserved_sums(model.tree, out.tracers, ac)
    # box test is a closed domain with no-flux boundaries: transport
    # conserves area and volume exactly
    np.testing.assert_allclose(float(s0["iceAreaCategory"]),
                               float(s1["iceAreaCategory"]), rtol=1e-12)
    np.testing.assert_allclose(float(s0["iceVolumeCategory"]),
                               float(s1["iceVolumeCategory"]), rtol=1e-12)
    u = np.asarray(out.velocity.u_velocity)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 0.0          # wind drove some motion
    assert np.abs(u).max() < 2.0          # physically sane ice speed
    a = np.asarray(out.tracers["iceAreaCategory"])
    assert a.min() >= -1e-12
    assert float(out.time) == model.cfg.run.dt


def test_multiple_steps_stable():
    model, state, forcing = _tiny_model()
    step = model.make_step()
    for _ in range(5):
        state, diags = step(model.tensors, state, forcing)
    u = np.asarray(state.velocity.u_velocity)
    a = np.asarray(state.tracers["iceAreaCategory"])
    assert np.isfinite(u).all() and np.isfinite(a).all()
    assert a.min() >= -1e-12


def test_full_physics_step():
    """Full coupled step: column thermo + EVP + IR transport + ridging
    on a small planar box with winter forcing."""
    import jax.numpy as jnp
    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig, \
        AdvectionConfig, ColumnConfig
    from seaice_tpu.column import (AtmosForcing, OceanForcing,
                                   slab_ocean_frzmlt)
    from seaice_tpu.column.thermo_shared import (
        salinity_profile, melting_temperature,
        ice_enthalpy_from_temperature, snow_enthalpy_from_temperature)

    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=5, n_ice_layers=7),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=4, rotate_cartesian_grid=False,
            include_metric_terms=False, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(),
        column=ColumnConfig())
    mesh = box.box_test_mesh(10, 10)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)

    ncat, NI, NS = 5, 7, 1
    nc = mesh.n_cells
    conc = np.clip(mesh.x_cell / box.BOX_LX, 0.0, 1.0)
    area = np.tile((conc / ncat)[:, None], (1, ncat)) * 0.9
    h = model.column.hin_max
    mids = 0.5 * (h[:-1] + np.minimum(h[1:], 10.0))
    vol = area * mids
    state = model.init_state(area, vol, area * 0.05)
    S = salinity_profile(NI)
    has = area[..., None] > 0
    tr = dict(state.tracers)
    tr["surfaceTemperature"] = jnp.asarray(np.where(area > 0, -12.0, 0.0))
    tr["iceEnthalpy"] = ice_enthalpy_from_temperature(
        jnp.asarray(np.where(has, -8.0, 0.0) * np.ones((nc, ncat, NI))),
        melting_temperature(jnp.asarray(np.tile(S, (nc, ncat, 1))))) * has
    tr["iceSalinity"] = jnp.asarray(np.tile(S, (nc, ncat, 1))) * has
    tr["snowEnthalpy"] = snow_enthalpy_from_temperature(
        jnp.asarray(-10.0 * np.ones((nc, ncat, NS)))) * has
    from seaice_tpu.utils.pytree import replace
    state = replace(state, tracers=tr)

    forcing = box.box_forcing(mesh, t=0.0)
    one = jnp.ones((nc,), jnp.float64)
    atm = AtmosForcing(
        air_temperature=252.0 * one, specific_humidity=0.0004 * one,
        u_air=forcing.u_air_velocity, v_air=forcing.v_air_velocity,
        longwave_down=170.0 * one,
        sw_vis_dir=5.0 * one, sw_vis_dif=5.0 * one,
        sw_ir_dir=4.0 * one, sw_ir_dif=4.0 * one,
        rain_rate=0.0 * one, snow_rate=1e-5 * one,
        air_density=1.3 * one, air_level_height=10.0 * one)
    sst = -1.7 * one
    Tf = -1.8 * one
    ocn = OceanForcing(
        sst=sst, sss=34.0 * one, freezing_temperature=Tf,
        frzmlt=slab_ocean_frzmlt(sst, Tf, 20.0 * one, cfg.run.dt),
        mixed_layer_depth=20.0 * one)

    step = model.make_step()
    for _ in range(3):
        state, diags = step(model.tensors, state, forcing, atm, ocn)
    a = np.asarray(state.tracers["iceAreaCategory"])
    v = np.asarray(state.tracers["iceVolumeCategory"])
    u = np.asarray(state.velocity.u_velocity)
    assert np.isfinite(a).all() and np.isfinite(v).all() and \
        np.isfinite(u).all()
    assert a.min() >= -1e-12 and a.sum(-1).max() <= 1.0 + 1e-9
    assert v.min() >= -1e-12
    assert np.abs(u).max() < 1.0
    fx = diags["column_fluxes"]
    assert np.isfinite(np.asarray(fx.fhocn)).all()
    # winter: somewhere ice must be growing
    assert float(fx.congel.max()) > 0.0
