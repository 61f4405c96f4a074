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
