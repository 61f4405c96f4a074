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
