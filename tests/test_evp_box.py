"""End-to-end EVP box test (reference: square testcase, the classic Hunke
box problem)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu import constants as c
from seaice_tpu.config import box_test_config
from seaice_tpu.dynamics.evp import (
    build_dynamics_tensors, init_velocity_state, make_velocity_solver)
from seaice_tpu.testcases import (
    box_test_mesh, box_forcing, box_initial_state, box_coriolis_parameter)


@pytest.fixture(scope="module")
def box():
    mesh = box_test_mesh(nx=20, ny=20)
    mesh.f_vertex = box_coriolis_parameter(mesh)
    cfg = box_test_config(elastic_subcycles=120)
    dyn = build_dynamics_tensors(mesh, cfg, dtype=jnp.float64)
    step = jax.jit(make_velocity_solver(cfg, dyn))
    return mesh, cfg, dyn, step


def test_box_evp_stability_and_physics(box):
    mesh, cfg, dyn, step = box
    area, vol, snow = box_initial_state(mesh)
    area_j = jnp.asarray(area)
    vol_j = jnp.asarray(vol)
    snow_j = jnp.asarray(snow)
    state = init_velocity_state(mesh, dtype=jnp.float64)

    n_steps = 6  # 1 hour at dt = 600 s
    for i in range(n_steps):
        forcing = box_forcing(mesh, i * cfg.run.dt)
        state, diags = step(state, forcing, area_j, vol_j, snow_j)

    u = np.asarray(state.u_velocity)
    v = np.asarray(state.v_velocity)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # drift speeds physically bounded (free drift is ~2% of wind ~ 0.2 m/s)
    speed = np.hypot(u, v)
    assert speed.max() < 1.0
    assert speed.max() > 0.01  # ice actually moves

    # boundary vertices must not move (wall boundary condition)
    bdy = mesh.interior_vertex == 0
    np.testing.assert_allclose(u[bdy], 0.0)
    np.testing.assert_allclose(v[bdy], 0.0)

    # open-water cells (x ~ 0, zero concentration) must not move
    solve_v = np.asarray(diags["solve_velocity"])
    np.testing.assert_allclose(u[solve_v == 0], 0.0)

    # principal stresses inside the elliptical yield curve: normalized
    # sigma1, sigma2 in [-P, +something small]
    sig1 = np.asarray(diags["principal_stress1"])
    sig2 = np.asarray(diags["principal_stress2"])
    p = np.asarray(diags["ice_pressure"])
    has_ice = p > 1.0
    # stress states stay within ~the yield envelope; EVP subcycling
    # transiently overshoots the ellipse by a few percent (measured ~6%
    # at 120 subcycles), so allow a 15% margin
    assert (sig1[has_ice] <= 0.15 * p[has_ice] + 1e-6).all()
    assert (sig2[has_ice] >= -1.15 * p[has_ice] - 1e-6).all()


def test_box_evp_stress_convergence(box):
    """With more subcycles the solution converges: compare 120 vs 240."""
    mesh, cfg, dyn, step120 = box
    area, vol, snow = map(jnp.asarray, box_initial_state(mesh))
    forcing = box_forcing(mesh, 0.0)

    s0 = init_velocity_state(mesh, dtype=jnp.float64)
    s120, _ = step120(s0, forcing, area, vol, snow)

    cfg240 = box_test_config(elastic_subcycles=240)
    step240 = jax.jit(make_velocity_solver(cfg240, dyn))
    s240, _ = step240(s0, forcing, area, vol, snow)

    u120 = np.asarray(s120.u_velocity)
    u240 = np.asarray(s240.u_velocity)
    # same ballpark solution (elastic waves damped differently, but fields
    # should agree to within ~20% RMS of the overall magnitude)
    scale = np.abs(u240).max()
    rms = np.sqrt(np.mean((u120 - u240) ** 2))
    assert rms < 0.2 * scale


def test_weak_scheme_box():
    """Weak (line-integral) scheme: runs and broadly agrees with the
    variational scheme on the box test."""
    import dataclasses
    from seaice_tpu.config import StrainScheme, StressDivergenceScheme
    from seaice_tpu.model import SeaIceModel

    cfg = box_test_config(elastic_subcycles=8)
    cfg_w = cfg.replace(velocity=dataclasses.replace(
        cfg.velocity, strain_scheme=StrainScheme.WEAK,
        stress_divergence_scheme=StressDivergenceScheme.WEAK))
    mesh = box_test_mesh(16, 16)
    mesh.f_vertex = box_coriolis_parameter(mesh)
    area, vol, snow = box_initial_state(mesh, 1)
    forcing = box_forcing(mesh, t=0.0)

    results = {}
    for name, cfg_i in (("var", cfg), ("weak", cfg_w)):
        model = SeaIceModel(mesh, cfg_i, dtype=jnp.float64)
        state = model.init_state(area, vol, snow)
        step = model.make_step()
        for _ in range(3):
            state, _ = step(model.tensors, state, forcing)
        results[name] = np.asarray(state.velocity.u_velocity)

    uw, uv = results["weak"], results["var"]
    assert np.isfinite(uw).all()
    assert uw.max() > 0.0
    # same order of magnitude and correlated: the schemes discretize the
    # same operator
    corr = np.corrcoef(uw, uv)[0, 1]
    assert corr > 0.9, corr


def test_implicit_vp_solver():
    """JFNK implicit VP solver agrees with well-converged EVP on the box
    test (a capability beyond the reference, built on jax.jvp + GMRES)."""
    from seaice_tpu.dynamics.implicit import make_vp_solver

    cfg = box_test_config(elastic_subcycles=240)
    mesh = box_test_mesh(12, 12)
    mesh.f_vertex = box_coriolis_parameter(mesh)
    dyn = build_dynamics_tensors(mesh, cfg, dtype=jnp.float64)
    area, vol, snow = box_initial_state(mesh, 1)
    area, vol, snow = map(jnp.asarray, (area, vol, snow))
    forcing = box_forcing(mesh, t=0.0)
    state = init_velocity_state(mesh, jnp.float64)

    evp_step = jax.jit(make_velocity_solver(cfg))
    vp_step = jax.jit(make_vp_solver(cfg, n_newton=12, gmres_iters=40))
    s_evp = s_vp = state
    for _ in range(3):
        s_evp, _ = evp_step(dyn, s_evp, forcing, area, vol, snow)
        s_vp, d_vp = vp_step(dyn, s_vp, forcing, area, vol, snow)
    u_evp = np.asarray(s_evp.u_velocity)
    u_vp = np.asarray(s_vp.u_velocity)
    assert np.isfinite(u_vp).all()
    mask = np.abs(u_evp) > 1e-4
    corr = np.corrcoef(u_evp[mask], u_vp[mask])[0, 1]
    assert corr > 0.8, corr
    assert float(d_vp["vp_residual_norm"]) < 10.0


def test_calc_velocity_masks_flag():
    """calc_velocity_masks=False solves everywhere the geometry allows
    instead of only under ice (reference velocity_solver.F:897) — the
    answer differs where the pack has open water."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from seaice_tpu.config import box_test_config
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box

    outs = {}
    for flag in (True, False):
        cfg = box_test_config(elastic_subcycles=4)
        cfg = dataclasses.replace(cfg, velocity=dataclasses.replace(
            cfg.velocity, calc_velocity_masks=flag))
        mesh = box.box_test_mesh(8, 8)
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        area, vol, snow = box.box_initial_state(mesh, 1)
        # open water strip: zero ice in the left third
        area = np.asarray(area)
        area[np.asarray(mesh.x_cell) < 0.3 * box.BOX_LX] = 0.0
        state = model.init_state(jnp.asarray(area), vol, snow)
        st, _ = model.make_step()(model.tensors, state,
                                  box.box_forcing(mesh, t=0.0))
        outs[flag] = np.asarray(st.velocity.u_velocity)
    assert not np.allclose(outs[True], outs[False])
