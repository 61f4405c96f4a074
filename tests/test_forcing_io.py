"""Forcing interpolation, derived-field formulas, bitwise restartability,
and the standalone run loop — mirroring the reference test strategy
(restartability.py: N steps == N/2 + restart + N/2, bitwise)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.forcing import (ForcingSeries, ModelClock,
                                longwave_parkinson_washington,
                                shortwave_down, split_precipitation,
                                limit_specific_humidity, shortwave_split)
from seaice_tpu.forcing.core import monthly_times, constant_series
from seaice_tpu.io import (save_checkpoint, load_checkpoint,
                           write_restart_timestamp,
                           read_restart_timestamp, OutputStream)
from seaice_tpu.config import box_test_config
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box


def test_clock():
    clk = ModelClock()
    assert clk.day_of_year == 1 and clk.month == 1
    clk.advance(86400.0 * 59)         # Mar 1 (noleap)
    assert clk.day_of_year == 60 and clk.month == 3
    clk.advance(86400.0 * 306)        # wrap to next year
    assert clk.year == 2 and clk.day_of_year == 1
    assert clk.timestamp() == "0002-01-01_00:00:00"


def test_forcing_interpolation_cyclic():
    n = 4
    times = np.array([0.0, 0.25, 0.5, 0.75]) * 365 * 86400.0
    vals = np.array([0.0, 1.0, 2.0, 1.0])
    s = ForcingSeries(times=times,
                      fields={"f": np.tile(vals[:, None], (1, n))})
    mid = s.interpolate(0.125 * 365 * 86400.0)["f"]
    np.testing.assert_allclose(mid, 0.5)
    # cyclic wrap: seconds between record 3 (0.75 yr) and record 0 (1 yr)
    wrap = s.interpolate(0.875 * 365 * 86400.0)["f"]
    np.testing.assert_allclose(wrap, 0.5)


def test_derived_field_formulas():
    t_air = np.array([250.0, 275.0])
    q = limit_specific_humidity(t_air, np.array([0.01, 0.01]))
    assert (q <= 0.01 + 1e-12).all() and (q > 0).all()
    # cold air has far lower saturation humidity
    assert q[0] < q[1]
    lw = longwave_parkinson_washington(t_air, np.array([0.5, 0.5]))
    assert (lw > 100.0).all() and (lw < 400.0).all()
    rain, snow = split_precipitation(np.array([1e-5, 1e-5]), t_air)
    assert snow[0] == 1e-5 and rain[0] == 0.0
    assert rain[1] == 1e-5 and snow[1] == 0.0
    # noon at a sunlit latitude in summer vs polar night
    sw_day = shortwave_down(np.array([0.0]), np.array([np.deg2rad(70.0)]),
                            np.array([0.2]), np.array([0.003]),
                            43200.0, 172)
    sw_night = shortwave_down(np.array([0.0]),
                              np.array([np.deg2rad(70.0)]),
                              np.array([0.2]), np.array([0.003]),
                              43200.0, 355)
    assert sw_day[0] > 200.0
    assert sw_night[0] < 50.0
    parts = shortwave_split(sw_day)
    np.testing.assert_allclose(sum(parts), sw_day, rtol=1e-12)


def test_bitwise_restartability(tmp_path):
    """2 steps straight == 1 step + checkpoint/restore + 1 step, BITWISE
    (the reference restartability.py invariant)."""
    cfg = box_test_config(elastic_subcycles=4)
    mesh = box.box_test_mesh(10, 10)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, 1)
    forcing = box.box_forcing(mesh, 0.0)
    step = model.make_step()

    s = model.init_state(area, vol, snow)
    s1, _ = step(model.tensors, s, forcing)
    s2_straight, _ = step(model.tensors, s1, forcing)

    path = os.path.join(tmp_path, "restart.npz")
    save_checkpoint(path, s1, {"year": 1, "seconds": 600.0})
    s1r, clock = load_checkpoint(path)
    assert int(clock["year"]) == 1
    s2_restart, _ = step(model.tensors, s1r, forcing)

    for name in ("u_velocity", "v_velocity", "stress11"):
        a = np.asarray(getattr(s2_straight.velocity, name))
        b = np.asarray(getattr(s2_restart.velocity, name))
        assert (a == b).all(), f"{name} not bitwise equal after restart"
    for name in s2_straight.tracers:
        a = np.asarray(s2_straight.tracers[name])
        b = np.asarray(s2_restart.tracers[name])
        assert (a == b).all(), f"{name} not bitwise equal after restart"


def test_restart_timestamp(tmp_path):
    write_restart_timestamp(str(tmp_path), "0001-01-02_00:00:00")
    assert read_restart_timestamp(str(tmp_path)) == "0001-01-02_00:00:00"


def test_output_stream(tmp_path):
    path = os.path.join(tmp_path, "out.nc")
    st = OutputStream(path, {"nCells": 4})
    st.write({"iceAreaCell": np.arange(4.0)}, "0001-01-01_00:00:00")
    st.write({"iceAreaCell": np.arange(4.0) * 2}, "0001-01-02_00:00:00")
    st.flush()
    from scipy.io import netcdf_file
    nc = netcdf_file(path, "r", mmap=False)
    data = np.array(nc.variables["iceAreaCell"][:])
    assert data.shape == (2, 4)
    np.testing.assert_allclose(data[1], np.arange(4.0) * 2)


def test_standalone_runner(tmp_path):
    """Run the host loop for a few steps with forcing + alarms."""
    from seaice_tpu.run import StandaloneRunner, RunStreams
    from seaice_tpu.forcing.core import CoreAtmosForcing, NcarOceanForcing

    cfg = box_test_config(elastic_subcycles=4)
    cfg = cfg.replace(run=cfg.run.__class__(dt=3600.0, n_categories=1))
    mesh = box.box_test_mesh(8, 8)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, 1)
    state = model.init_state(area, vol, snow)

    nc = mesh.n_cells
    six = ForcingSeries(
        times=np.array([0.0, 180 * 86400.0]),
        fields={"airTemperature": np.full((2, nc), 255.0),
                "airSpecificHumidity": np.full((2, nc), 4e-4),
                "uAirVelocity": np.full((2, nc), 4.0),
                "vAirVelocity": np.full((2, nc), 1.0)})
    mon = ForcingSeries(
        times=monthly_times(),
        fields={"cloudFraction": np.full((12, nc), 0.5),
                "precipitationRate": np.full((12, nc), 1e-6)})
    atmos = CoreAtmosForcing(six_hourly=six, monthly=mon,
                             lon=np.zeros(nc),
                             lat=np.full(nc, np.deg2rad(75.0)))
    ocean = NcarOceanForcing(monthly=constant_series(
        nc, seaSurfaceTemperature=-1.7, seaSurfaceSalinity=34.0,
        seaFreezingTemperature=-1.8, oceanMixedLayerDepth=20.0,
        uOceanVelocity=0.0, vOceanVelocity=0.0))

    out = OutputStream(os.path.join(tmp_path, "out.npz"), {"nCells": nc})
    runner = StandaloneRunner(
        model, state, atmos_forcing=atmos, ocean_forcing=ocean,
        streams=RunStreams(output=out, output_interval=2 * 3600.0,
                           restart_dir=str(tmp_path),
                           restart_interval=3 * 3600.0))
    runner.run(4, check_interval=2)
    out.flush()
    assert runner.clock.seconds == 4 * 3600.0
    assert len(out.records) >= 1
    assert read_restart_timestamp(str(tmp_path)) is not None
    assert "timestep" in runner.timers.totals


def test_mesh_file_roundtrip(tmp_path):
    """Write a synthesized-to-spec MPAS mesh file and read it back
    through io.mesh_reader; the read mesh must drive the model to the
    same answer as the in-memory mesh (VERDICT r1 missing item 6)."""
    import jax.numpy as jnp
    from seaice_tpu.io.mesh_reader import read_mpas_mesh, write_mpas_mesh
    from seaice_tpu.config import box_test_config
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box

    mesh0 = box.box_test_mesh(6, 6)
    path = str(tmp_path / "mesh.nc")
    write_mpas_mesh(path, mesh0)
    mesh1 = read_mpas_mesh(path)
    assert mesh1.n_cells == mesh0.n_cells
    assert mesh1.n_vertices == mesh0.n_vertices
    np.testing.assert_array_equal(mesh1.vertices_on_cell,
                                  mesh0.vertices_on_cell)
    np.testing.assert_allclose(mesh1.area_cell, mesh0.area_cell)

    cfg = box_test_config(elastic_subcycles=2)
    outs = []
    for mesh in (mesh0, mesh1):
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        area, vol, snow = box.box_initial_state(mesh, 1)
        state = model.init_state(area, vol, snow)
        forcing = box.box_forcing(mesh, t=0.0)
        out, _ = model.make_step()(model.tensors, state, forcing)
        outs.append(np.asarray(out.velocity.u_velocity))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-13)


def test_forcing_file_roundtrip(tmp_path):
    """CORE/NCAR forcing read from synthesized-to-spec NetCDF files
    drives the runner identically to the in-memory series."""
    from seaice_tpu.forcing.core import ForcingSeries, monthly_times
    from seaice_tpu.io.forcing_reader import (
        core_atmos_from_files, ncar_ocean_from_file,
        read_forcing_series, write_forcing_series,
        CORE_SIXHOURLY_FIELDS)

    nc_cells = 16
    rng = np.random.RandomState(0)
    t6 = np.arange(0, 365 * 86400, 6 * 3600, dtype=float)[:8]
    sixh = ForcingSeries(times=t6, fields={
        "airTemperature": 250.0 + 10 * rng.rand(len(t6), nc_cells),
        "airSpecificHumidity": 4e-4 * np.ones((len(t6), nc_cells)),
        "uAirVelocity": rng.randn(len(t6), nc_cells),
        "vAirVelocity": rng.randn(len(t6), nc_cells)})
    monthly = ForcingSeries(times=monthly_times(), fields={
        "cloudFraction": 0.5 * np.ones((12, nc_cells)),
        "precipitationRate": 1e-6 * np.ones((12, nc_cells))})
    ocean = ForcingSeries(times=monthly_times(), fields={
        "seaSurfaceTemperature": -1.5 * np.ones((12, nc_cells)),
        "seaSurfaceSalinity": 34.0 * np.ones((12, nc_cells)),
        "oceanMixedLayerDepth": 20.0 * np.ones((12, nc_cells))})

    p6 = str(tmp_path / "core_sixhourly.nc")
    pm = str(tmp_path / "core_monthly.nc")
    po = str(tmp_path / "ncar_ocean.nc")
    write_forcing_series(p6, sixh)
    write_forcing_series(pm, monthly)
    write_forcing_series(po, ocean)

    lon = np.linspace(0, 2 * np.pi, nc_cells, endpoint=False)
    lat = np.full(nc_cells, 1.2)
    atm = core_atmos_from_files(p6, pm, lon, lat)
    ocn = ncar_ocean_from_file(po)

    # interpolation identical to the in-memory series
    s_file = atm.six_hourly.interpolate(9000.0)
    s_mem = sixh.interpolate(9000.0)
    for k in s_mem:
        np.testing.assert_allclose(s_file[k], s_mem[k])
    o = ocn.snapshot(ModelClock())
    np.testing.assert_allclose(o["seaSurfaceTemperature"], -1.5)

    # reading with an explicit field subset works
    sub = read_forcing_series(p6, CORE_SIXHOURLY_FIELDS)
    assert set(sub.fields) == set(CORE_SIXHOURLY_FIELDS.values())


def test_ice_state_file_init(tmp_path):
    """File-based initial state (reference input stream at init): a
    written IC file round-trips through init_state_from_file, and a
    stepped trajectory from it matches the in-memory state bitwise."""
    import dataclasses
    from seaice_tpu.config import box_test_config
    from seaice_tpu.io import init_state_from_file, write_ice_state
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box
    from seaice_tpu.utils.pytree import replace

    cfg = box_test_config(elastic_subcycles=2)
    cfg = dataclasses.replace(cfg, column=dataclasses.replace(
        cfg.column, use_column_package=True))
    mesh = box.box_test_mesh(6, 6)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    ref_state = model.init_state(area, vol, snow)
    # perturb a tracer so defaults differ from the file
    tr = dict(ref_state.tracers)
    tr["surfaceTemperature"] = tr["surfaceTemperature"] - 3.0
    ref_state = replace(ref_state, tracers=tr)
    uvel = jnp.asarray(np.linspace(0, 0.1, mesh.n_vertices))
    ref_state = replace(ref_state, velocity=replace(
        ref_state.velocity, u_velocity=uvel))

    for suffix in ("nc", "npz"):
        path = str(tmp_path / f"ic.{suffix}")
        write_ice_state(path, ref_state.tracers,
                        u_velocity=ref_state.velocity.u_velocity,
                        v_velocity=ref_state.velocity.v_velocity)
        loaded = init_state_from_file(model, path)
        for name in ref_state.tracers:
            np.testing.assert_array_equal(
                np.asarray(loaded.tracers[name]),
                np.asarray(ref_state.tracers[name]), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(loaded.velocity.u_velocity), np.asarray(uvel))

    # stepping from the loaded state matches stepping from memory
    step = model.make_step()
    forcing = box.box_forcing(mesh, t=0.0)
    s1, _ = step(model.tensors, ref_state, forcing)
    s2, _ = step(model.tensors, loaded, forcing)
    np.testing.assert_array_equal(
        np.asarray(s1.tracers["iceAreaCategory"]),
        np.asarray(s2.tracers["iceAreaCategory"]))


def test_data_iceberg_forcing():
    """Data-iceberg monthly climatology: linear interp + derived
    latent heat at -4 C (reference get_data_iceberg_fluxes :1752)."""
    from seaice_tpu import constants as c
    from seaice_tpu.forcing.clock import ModelClock
    from seaice_tpu.forcing.core import DataIcebergForcing, ForcingSeries

    nc = 4
    data = np.stack([np.full(nc, 1e-6 * (m + 1)) for m in range(12)])
    series = ForcingSeries(times=monthly_times(),
                           fields={"bergFreshwaterFluxData": data})
    bergs = DataIcebergForcing(monthly=series)
    clock = ModelClock()
    clock.advance(40 * 86400.0)        # mid-February
    out = bergs.snapshot(clock)
    fw = out["bergFreshwaterFlux"]
    assert 1e-6 < fw.mean() < 3e-6
    want = -fw * (c.LATENT_HEAT_MELTING - 2106.0 * (-4.0))
    np.testing.assert_allclose(out["bergLatentHeatFlux"], want,
                               rtol=1e-12)
