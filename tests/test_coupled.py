"""Coupled driver (MCT/NUOPC ModelAdvance analog): the couple-alarm
sub-loop, flux time-averaging over the interval, and the import/export
surface (reference driver/ice_comp_mct.F:1004, ice_import_export.F90)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig, \
    ColumnConfig, box_test_config
from seaice_tpu.coupled import CoupledDriver
from seaice_tpu.coupler import EXPORT_FIELDS, IMPORT_FIELDS
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box


def _model(nx=8, subcycles=4, column=True):
    cfg = box_test_config(elastic_subcycles=subcycles)
    if column:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, column=dataclasses.replace(
                cfg.column, use_column_package=True))
    mesh = box.box_test_mesh(nx, nx)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    return model, state, mesh


def _imports(mesh):
    nc = mesh.n_cells
    rng = np.random.default_rng(3)
    return {
        "So_t": np.full(nc, -1.6), "So_s": np.full(nc, 32.0),
        "So_u": 0.02 * rng.standard_normal(nc),
        "So_v": 0.02 * rng.standard_normal(nc),
        "Sa_u": 5.0 + rng.standard_normal(nc),
        "Sa_v": 2.0 + rng.standard_normal(nc),
        "Sa_ptem": np.full(nc, 260.0), "Sa_tbot": np.full(nc, 260.0),
        "Sa_shum": np.full(nc, 8e-4), "Sa_dens": np.full(nc, 1.3),
        "Faxa_lwdn": np.full(nc, 200.0),
        "Faxa_swvdr": np.full(nc, 30.0), "Faxa_swvdf": np.full(nc, 20.0),
        "Faxa_swndr": np.full(nc, 25.0), "Faxa_swndf": np.full(nc, 15.0),
        "Faxa_rain": np.zeros(nc), "Faxa_snow": np.full(nc, 1e-8),
    }


def test_interval_must_divide():
    model, state, mesh = _model(column=False)
    with pytest.raises(ValueError):
        CoupledDriver(model, state,
                      coupling_interval=model.cfg.run.dt * 2.5)


def test_advance_exports_roster():
    model, state, mesh = _model()
    dt = model.cfg.run.dt
    drv = CoupledDriver(model, state, coupling_interval=4 * dt)
    imp, exp = drv.advertise()
    assert imp == IMPORT_FIELDS and exp == EXPORT_FIELDS
    out = drv.advance(_imports(mesh))
    # fractions/states + averaged fluxes + cell-interpolated stresses
    for key in ("Si_ifrac", "Si_vice", "Si_t", "Faii_sen", "Faii_lwup",
                "Fioi_melth", "Fioi_meltw", "Fioi_salt",
                "Fioi_taux", "Fioi_tauy"):
        assert key in out, key
        assert np.isfinite(out[key]).all(), key
        assert out[key].shape == (mesh.n_cells,), key
    assert float(drv.clock.seconds) == 4 * dt
    # second interval advances the clock and keeps the state finite
    out2 = drv.advance(_imports(mesh))
    assert float(drv.clock.seconds) == 8 * dt
    assert np.isfinite(out2["Si_ifrac"]).all()


def test_flux_export_is_interval_mean():
    """The exported sensible-heat flux equals the mean of the
    per-substep fluxes (reference averaged-coupler-field semantics)."""
    model, state, mesh = _model()
    dt = model.cfg.run.dt
    n_sub = 3
    drv = CoupledDriver(model, state, coupling_interval=n_sub * dt)
    fields = _imports(mesh)
    out = drv.advance(fields)

    # manual sub-loop with identical per-substep zenith angles
    from seaice_tpu.column.orbital import compute_coszen
    from seaice_tpu.coupler import import_state
    model2, state2, _ = _model()
    dyn, atmf, ocnf = import_state(fields, dt, dtype=jnp.float64)
    step = model2.make_step()
    lat = jnp.asarray(mesh.lat_cell, jnp.float64)
    lon = jnp.asarray(mesh.lon_cell, jnp.float64)
    acc = None
    for i in range(n_sub):
        secs = (i + 0.5) * dt
        doy = 1.0 + np.floor(secs / 86400.0)
        coszen, _ = compute_coszen(lat, lon, doy, secs % 86400.0)
        state2, diags = step(model2.tensors, state2, dyn, atmf, ocnf,
                             coszen=coszen, day_of_year=doy, lat=lat)
        f = diags["column_fluxes"].fsens
        acc = f if acc is None else acc + f
    want = np.asarray(acc) / n_sub
    np.testing.assert_allclose(out["Faii_sen"], want, rtol=1e-12,
                               atol=1e-12)
    # and the advanced state matches the manual sub-loop bitwise
    np.testing.assert_array_equal(
        np.asarray(drv.state.tracers["iceAreaCategory"]),
        np.asarray(state2.tracers["iceAreaCategory"]))


def test_sharded_coupled_driver_matches_single_device():
    """ShardedCoupledDriver over 4 shards reproduces the single-device
    CoupledDriver trajectory (decomposed ice_run_mct; gathers only at
    the coupler boundary)."""
    from seaice_tpu.coupled import ShardedCoupledDriver
    from seaice_tpu.parallel import ShardedSeaIceModel

    model, state, mesh = _model(nx=10)
    dt = model.cfg.run.dt
    fields = _imports(mesh)
    ref = CoupledDriver(model, state, coupling_interval=3 * dt)
    out_ref = ref.advance(fields)

    sm = ShardedSeaIceModel(mesh, model.cfg, 4, dtype=jnp.float64)
    area, vol, snow = __import__(
        "seaice_tpu.testcases.box", fromlist=["box"]
    ).box_initial_state(mesh, n_categories=1)
    sstate = sm.init_state(area, vol, snow)
    drv = ShardedCoupledDriver(sm, sstate, coupling_interval=3 * dt)
    out_s = drv.advance(fields)

    for key in ("Si_ifrac", "Si_vice", "Fioi_melth", "Faii_sen"):
        np.testing.assert_allclose(out_s[key], out_ref[key],
                                   rtol=1e-8, atol=1e-10,
                                   err_msg=key)


def test_prescribed_ice_in_coupled_driver():
    """Prescribed (data) ice mode inside the coupled loop: the coverage
    stream is imposed on the state at every substep, velocities are
    zeroed, and exports reflect the prescribed state (reference
    driver/ice_comp_mct.F: ice_prescribed_init :812, ice_prescribed_run
    :1125 in the run loop)."""
    from seaice_tpu.forcing.core import ForcingSeries

    model, state, mesh = _model()
    dt = model.cfg.run.dt
    nc = mesh.n_cells
    cov = np.where(mesh.x_cell > mesh.x_cell.mean(), 0.8, 0.0)
    series = ForcingSeries(times=np.array([0.0]),
                           fields={"iceCoverage": cov[None, :]})
    drv = CoupledDriver(model, state, coupling_interval=4 * dt,
                        prescribed_coverage=series)
    out = drv.advance(_imports(mesh))
    aice = np.asarray(drv.state.tracers["iceAreaCategory"]).sum(-1)
    # thermodynamics ran AFTER the final imposition, so coverage is not
    # bitwise — but the data-ice pattern must dominate the state
    assert abs(aice[cov > 0].mean() - 0.8) < 0.05
    assert aice[cov == 0].max() < 0.05
    # prescribed mode: the NH prescribed thickness is 2 m
    vice = np.asarray(drv.state.tracers["iceVolumeCategory"]).sum(-1)
    h = vice[cov > 0] / np.maximum(aice[cov > 0], 1e-12)
    assert abs(np.median(h) - 2.0) < 0.3
    assert np.isfinite(out["Si_ifrac"]).all()
    # export fractions follow the prescribed coverage
    assert out["Si_ifrac"][cov > 0].mean() > 0.5
    # without the column package, prescribed mode is rejected
    model2, state2, _ = _model(column=False)
    with pytest.raises(ValueError):
        CoupledDriver(model2, state2, coupling_interval=4 * dt,
                      prescribed_coverage=series)
