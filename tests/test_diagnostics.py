"""State checks, conservation monitor, regional stats, timers."""

import jax
import numpy as np
import jax.numpy as jnp

from seaice_tpu.config import box_test_config
from seaice_tpu.diagnostics import (ConservationMonitor, PhaseTimers,
                                    check_state, regional_statistics,
                                    total_budgets)
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box


def _state():
    cfg = box_test_config(elastic_subcycles=2)
    mesh = box.box_test_mesh(6, 6)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, 1)
    return model, model.init_state(area, vol, snow)


def test_check_state_pass_and_fail():
    model, state = _state()
    checks = check_state(state)
    assert bool(checks["ok"])
    # corrupt: NaN velocity
    from seaice_tpu.utils.pytree import replace
    bad_vel = replace(state.velocity,
                      u_velocity=state.velocity.u_velocity.at[0].set(
                          jnp.nan))
    bad = replace(state, velocity=bad_vel)
    checks = check_state(bad)
    assert not bool(checks["ok"])
    assert not bool(checks["finite_velocity"])


def test_total_budgets_and_monitor():
    model, state = _state()
    ac = model.tensors.area_cell
    b = total_budgets(state, ac)
    assert float(b["ice_mass"]) > 0.0
    mon = ConservationMonitor(ac)
    mon.reset(state)
    errs = mon.errors(state)       # no change, no fluxes -> closure 0
    assert errs["mass_closure"] < 1e-14


def test_regional_statistics():
    model, state = _state()
    nc = model.mesh.n_cells
    region = jnp.asarray((np.arange(nc) % 2), jnp.int32)
    out = regional_statistics(state, model.tensors.area_cell, region, 2)
    total = float(out["total_ice_area"].sum())
    direct = float((state.tracers["iceAreaCategory"].sum(-1) *
                    model.tensors.area_cell).sum())
    np.testing.assert_allclose(total, direct, rtol=1e-12)


def test_phase_timers():
    t = PhaseTimers()
    with t.time("a"):
        sum(range(1000))
    with t.time("a"):
        sum(range(1000))
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_abort_dump(tmp_path):
    """Failed state checks dump the full state then raise
    (the reference abort-stream protocol, mpas_seaice_error.F:44-119)."""
    import pytest
    from seaice_tpu.error import SeaIceAbort, check_critical_error
    from seaice_tpu.utils.pytree import replace

    model, state = _state()
    # healthy state passes silently
    check_critical_error(state, "0001-01-01_00:00:00", str(tmp_path))
    # poison it
    bad_vel = replace(state.velocity,
                      u_velocity=state.velocity.u_velocity.at[3].set(
                          jnp.inf))
    bad = replace(state, velocity=bad_vel)
    with pytest.raises(SeaIceAbort) as ei:
        check_critical_error(bad, "0001-01-01_01:00:00", str(tmp_path))
    assert ei.value.dump_path is not None
    import os
    assert os.path.exists(ei.value.dump_path)
    z = np.load(ei.value.dump_path)
    assert "velocity.u_velocity" in z.files


def test_column_warning_cell_dump(tmp_path):
    """Column warnings with per-cell attribution: the failing cells'
    FULL column state is dumped (the reference warning-buffer +
    per-cell abort dump, ice_warnings.F90 /
    mpas_seaice_column.F:1872-1939)."""
    import pytest
    from seaice_tpu.error import SeaIceAbort, raise_on_failed_checks

    model, state = _state()
    ncat = state.tracers["iceAreaCategory"].shape[1]
    mask = np.zeros(state.tracers["iceAreaCategory"].shape, bool)
    mask[5, 0] = True
    mask[17, ncat - 1] = True
    checks = {"ok": jnp.array(False),
              "column_thermo_unconverged": jnp.array(False)}
    with pytest.raises(SeaIceAbort) as ei:
        raise_on_failed_checks(
            checks, state, "0001-01-01_02:00:00", str(tmp_path),
            cell_masks={"column_thermo_unconverged": jnp.asarray(mask)})
    import glob
    dumps = glob.glob(str(tmp_path / "cell_failure.*.npz"))
    assert len(dumps) == 1
    z = np.load(dumps[0])
    np.testing.assert_array_equal(sorted(z["cell_index"]), [5, 17])
    assert str(z["reason"]) == "column_thermo_unconverged"
    # every tracer's full column state present for the failing cells
    for name in state.tracers:
        key = "tracer_" + name
        assert key in z.files, key
        np.testing.assert_allclose(
            z[key][list(z["cell_index"]).index(5)],
            np.asarray(state.tracers[name][5]))


def test_healthy_column_step_has_clean_warnings():
    """A sane full-physics step reports an all-clear warning buffer
    (and the warnings ride the ColumnFluxes so the runner's abort gate
    sees them)."""
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.config import Config, RunConfig, ColumnConfig, \
        VelocitySolverConfig
    from seaice_tpu.testcases import box as boxtc
    from seaice_tpu.utils.pytree import replace as pt_replace

    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=3, n_ice_layers=4),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=4, rotate_cartesian_grid=False,
            include_metric_terms=False, geostrophic_surface_tilt=False),
        column=ColumnConfig())
    mesh = boxtc.box_test_mesh(8, 8)
    mesh.f_vertex = boxtc.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    (area, vol, snow, extra, atm, ocn,
     coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
    state = model.init_state(area, vol, snow)
    tr = dict(state.tracers)
    for k, v in extra.items():
        tr[k] = jnp.asarray(v)
    state = pt_replace(state, tracers=tr)
    forcing = boxtc.box_forcing(mesh, t=0.0)
    step = model.make_step()
    atm = jax.tree.map(jnp.asarray, atm)
    ocn = jax.tree.map(jnp.asarray, ocn)
    state, diags = step(model.tensors, state, forcing, atm, ocn,
                        coszen=jnp.asarray(coszen))
    w = diags["column_fluxes"].warnings
    assert "thermo_unconverged" in w
    assert not bool(np.asarray(w["thermo_unconverged"]).any())
