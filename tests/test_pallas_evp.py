"""Fused Pallas EVP subcycle kernel vs the XLA structured oracle.

The kernel (dynamics/pallas_evp.py) runs the whole elastic subcycle
loop (reference mpas_seaice_velocity_solver.F:2447-2592) in one Pallas
call with all state VMEM-resident; on CPU it runs in interpret mode,
so this validates the kernel logic (the TPU lowering is exercised by
bench.py on hardware).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from seaice_tpu.config import box_test_config
from seaice_tpu.mesh.structured import detect_raster_quad, raster_reorder
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box


def _box_model(use_pallas, nx=24, n_sub=40, dtype=jnp.float64):
    cfg = box_test_config(elastic_subcycles=n_sub)
    cfg = dataclasses.replace(
        cfg, velocity=dataclasses.replace(
            cfg.velocity, use_pallas_subcycle=use_pallas))
    mesh = raster_reorder(box.box_test_mesh(nx, nx))
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=dtype)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    forcing = box.box_forcing(mesh, t=0.0, dtype=dtype)
    return model, state, forcing


def test_fused_subcycle_matches_xla_oracle():
    """Full velocity-solver trajectories agree over several coupling
    steps (the only divergence is the cell-constant basis table, equal
    to the per-cell basis to ~1e-14 relative on the uniform grid)."""
    model_p, state_p, forcing = _box_model(True)
    model_x, state_x, _ = _box_model(None)   # auto=off on CPU -> XLA path
    step_p = model_p.make_step()
    step_x = model_x.make_step()
    for _ in range(3):
        state_p, _ = step_p(model_p.tensors, state_p, forcing)
        state_x, _ = step_x(model_x.tensors, state_x, forcing)
    u_p = np.asarray(state_p.velocity.u_velocity)
    u_x = np.asarray(state_x.velocity.u_velocity)
    s_p = np.asarray(state_p.velocity.stress11)
    s_x = np.asarray(state_x.velocity.stress11)
    uscale = np.abs(u_x).max()
    sscale = np.abs(s_x).max()
    assert uscale > 1e-4          # the box spins up real motion
    np.testing.assert_allclose(u_p, u_x, atol=1e-9 * uscale)
    np.testing.assert_allclose(np.asarray(state_p.velocity.v_velocity),
                               np.asarray(state_x.velocity.v_velocity),
                               atol=1e-9 * uscale)
    np.testing.assert_allclose(s_p, s_x, atol=1e-9 * sscale)


def test_ineligible_config_raises():
    """use_pallas_subcycle=True on an ineligible config must hard-error,
    not silently fall back (the dead-flag rule from VERDICT round 1)."""
    cfg = box_test_config(elastic_subcycles=8)
    cfg = dataclasses.replace(
        cfg, velocity=dataclasses.replace(
            cfg.velocity, use_pallas_subcycle=True,
            use_ocean_stress=False))
    mesh = raster_reorder(box.box_test_mesh(8, 8))
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    with pytest.raises(ValueError):
        model.make_step()
