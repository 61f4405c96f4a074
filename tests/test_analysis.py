"""Analysis members framework + prescribed ice + special boundaries."""

import numpy as np
import jax.numpy as jnp

from seaice_tpu.analysis import AnalysisDriver, default_members
from seaice_tpu.analysis.members import (PointwiseStatsMember,
                                         TimeSeriesStatsMember)
from seaice_tpu.config import box_test_config
from seaice_tpu.forcing.clock import ModelClock
from seaice_tpu.model import SeaIceModel
from seaice_tpu.prescribed import prescribe_ice_state
from seaice_tpu.special_boundaries import (SpecialBoundaries,
                                           apply_tracer_boundaries,
                                           apply_velocity_boundaries,
                                           no_special_boundaries)
from seaice_tpu.testcases import box


def _model():
    cfg = box_test_config(elastic_subcycles=2)
    mesh = box.box_test_mesh(6, 6)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box.box_initial_state(mesh, 1)
    return model, model.init_state(area, vol, snow)


def test_analysis_driver_hooks():
    model, state = _model()
    members = default_members(compute_interval=3600.0)
    members.append(PointwiseStatsMember([0, 5],
                                        compute_interval=3600.0))
    drv = AnalysisDriver(members)
    drv.bootstrap(model, state)
    drv.init(model, state)
    clk = ModelClock()
    for _ in range(2):
        clk.advance(3600.0)
        drv.on_timestep(model, state, clk)
    hf = drv.result("high_frequency_output")
    assert "iceAreaCellHF" in hf and np.isfinite(
        hf["iceAreaCellHF"]).all()
    cons = drv.result("conservation_check")
    assert cons["closure_mass_closure"] < 1e-12
    rs = drv.result("regional_statistics")
    assert float(rs["total_ice_area"].sum()) > 0
    pw = drv.result("pointwise_stats")
    assert pw["iceAreaAtPoints"].shape == (2,)
    ts = drv.result("time_series_stats")
    assert "iceAreaCell_avg" in ts
    np.testing.assert_allclose(ts["iceAreaCell_avg"],
                               ts["iceAreaCell_max"])
    assert drv.result("ice_present")["icePresent"].max() == 1.0


def test_prescribed_ice():
    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
    cfg = Config(run=RunConfig(dt=1800.0),
                 velocity=VelocitySolverConfig(
                     elastic_subcycle_number=2,
                     rotate_cartesian_grid=False,
                     include_metric_terms=False))
    mesh = box.box_test_mesh(6, 6)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    state = model.init_state()
    nc = mesh.n_cells
    cov = np.zeros(nc)
    cov[: nc // 2] = 0.8
    # northern-hemisphere cells -> 2 m prescribed thickness
    tr = prescribe_ice_state(
        state.tracers, jnp.asarray(cov),
        jnp.full((nc,), 1.0),              # lat > 0
        jnp.full((nc,), -1.8),
        model.column.hin_max)
    a = np.asarray(tr["iceAreaCategory"])
    v = np.asarray(tr["iceVolumeCategory"])
    np.testing.assert_allclose(a.sum(-1)[: nc // 2], 0.8)
    np.testing.assert_allclose(a.sum(-1)[nc // 2:], 0.0)
    # prescribed h = 2 m sits in category 3 (bounds 1.39-2.47)
    has = a.sum(-1) > 0
    h = v.sum(-1)[has] / a.sum(-1)[has]
    np.testing.assert_allclose(h, 2.0)
    q = np.asarray(tr["iceEnthalpy"])
    assert (q[has] <= 0.0).all() and np.abs(q[has]).max() > 0


def test_special_boundaries():
    model, state = _model()
    nv = model.mesh.n_vertices
    nc = model.mesh.n_cells
    sb = no_special_boundaries(nv, nc)
    u = jnp.ones((nv,))
    v = jnp.ones((nv,))
    u2, v2 = apply_velocity_boundaries(sb, u, v)
    np.testing.assert_allclose(np.asarray(u2), 1.0)

    mask = jnp.zeros((nv,)).at[0].set(1.0)
    sb2 = SpecialBoundaries(
        vertex_mask=mask, u_value=jnp.full((nv,), 5.0),
        v_value=jnp.zeros((nv,)),
        cell_mask=jnp.zeros((nc,)).at[0].set(1.0),
        tracer_values={"iceAreaCategory":
                       jnp.full((nc, 1), 0.123)})
    u3, _ = apply_velocity_boundaries(sb2, u, v)
    assert float(u3[0]) == 5.0 and float(u3[1]) == 1.0
    tr = apply_tracer_boundaries(sb2, state.tracers)
    assert float(tr["iceAreaCategory"][0, 0]) == 0.123
