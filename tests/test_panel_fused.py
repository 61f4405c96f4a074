"""Fused panel EVP kernel: strip schedule + trajectory equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.mesh import icosahedral_mesh
from seaice_tpu.mesh.panels import panel_reorder
from seaice_tpu.dynamics.panel_strips import (
    apply_strip_runs, build_pu_strip_runs, build_vertex_strip_runs)


def _setup(subdiv):
    mesh, lay = panel_reorder(icosahedral_mesh(subdiv), subdiv)
    from seaice_tpu.config import Config, VelocitySolverConfig
    from seaice_tpu.dynamics.evp import build_dynamics_tensors
    cfg = Config(velocity=VelocitySolverConfig(
        rotate_cartesian_grid=True, include_metric_terms=True))
    dyn = build_dynamics_tensors(mesh, cfg, jnp.float64)
    return mesh, lay, dyn.panel


@pytest.mark.parametrize("subdiv", [2, 3, 4])
def test_vertex_strip_schedule_matches_gather_maps(subdiv):
    """Replaying the static strip schedule reproduces the XLA plane
    builder (_vertex_planes) including every seam ghost."""
    from seaice_tpu.dynamics.variational_panel import _vertex_planes
    mesh, lay, pt = _setup(subdiv)
    N = lay.N
    rng = np.random.RandomState(0)
    uv = rng.randn(mesh.n_vertices, 2)

    ref = np.asarray(_vertex_planes(pt, N, jnp.asarray(uv)))
    ref = ref.reshape(2, 10, N + 1, N + 1, 2)

    mine = np.zeros((2, 10, N + 1, N + 1, 2))
    interior = np.moveaxis(uv.reshape(10, N, N, 2, 2), 3, 0)
    mine[:, :, :N, 1:] = interior
    runs = build_vertex_strip_runs(lay, N)
    for f in range(2):
        mine[..., f] = apply_strip_runs(runs, mine[..., f], N)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("subdiv", [2, 3, 4])
def test_pu_strip_schedule_matches_gather_maps(subdiv):
    """Replaying the pu strip schedule reproduces divergence_finish's
    broadcast-select ghost merge."""
    mesh, lay, pt = _setup(subdiv)
    N = lay.N
    npp = 10 * (N + 1) ** 2
    npc = int(pt.basis_grad_S.shape[-1])
    rng = np.random.RandomState(1)
    stacked = rng.randn(6, npc)

    # reference merge (the XLA formulation in divergence_finish)
    src_flat = stacked.reshape(-1)
    pu1 = np.concatenate([[0.0], src_flat + 0.0])  # not used; maps
    row = src_flat[np.asarray(pt.pu_row_src)]      # [6, 10, N+1]
    col = src_flat[np.asarray(pt.pu_col_src)]      # [6, 10, N+1]
    ref = stacked[:, :npp].reshape(6, 10, N + 1, N + 1).copy()
    a_ix = np.arange(N + 1)
    ref = np.where((a_ix == 0)[None, None, :, None], row[:, :, None, :],
                   np.where((a_ix == N)[None, None, None, :],
                            col[:, :, :, None], ref))

    mine = stacked[:, :npp].reshape(6, 10, N + 1, N + 1)
    runs = build_pu_strip_runs(lay, N)
    mine = apply_strip_runs(runs, mine, N)
    np.testing.assert_array_equal(mine, ref)


# -- full-solve trajectory equivalence (interpret mode) ----------------------


def _problem(metric, subcycles, dtype, subdiv=3):
    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
    from seaice_tpu.dynamics.evp import (DynamicsForcing,
                                         build_dynamics_tensors,
                                         init_velocity_state)
    mesh, lay = panel_reorder(icosahedral_mesh(subdiv), subdiv)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=1),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=subcycles,
            rotate_cartesian_grid=True,
            include_metric_terms=metric,
            geostrophic_surface_tilt=False))
    dyn = build_dynamics_tensors(mesh, cfg, dtype)
    nc = mesh.n_cells
    rng = np.random.default_rng(0)
    # nonuniform ice with open-water cells: exercises the solve masks
    area = np.clip(rng.uniform(-0.3, 0.95, (nc, 1)), 0.0, 1.0)
    vol = area * rng.uniform(0.5, 2.5, (nc, 1))
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(5.0 * rng.standard_normal(nc), dtype),
        v_air_velocity=jnp.asarray(2.0 * rng.standard_normal(nc), dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        v_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        sea_surface_tilt_u=jnp.zeros((nc,), dtype),
        sea_surface_tilt_v=jnp.zeros((nc,), dtype),
        land_ice_mask=jnp.zeros((nc,), dtype))
    state = init_velocity_state(mesh, dtype)
    return (mesh, lay, cfg, dyn, jnp.asarray(area, dtype),
            jnp.asarray(vol, dtype), forcing, state)


@pytest.mark.parametrize("metric", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float64])
def test_fused_panel_loop_matches_xla(metric, dtype):
    """A full velocity solve through the fully-fused whole-loop kernel
    (interpret mode) must match the XLA panel path to reduction-order
    tolerance (f64: ~1e-12 relative)."""
    from seaice_tpu.dynamics.evp import make_velocity_solver
    mesh, lay, cfg, dyn, area, vol, forcing, state = _problem(
        metric, subcycles=6, dtype=dtype)
    mdv = float(np.min(mesh.dv_edge[mesh.dv_edge > 0]))
    snow = jnp.zeros_like(vol)

    solver_ref = make_velocity_solver(cfg, min_dv_edge=mdv,
                                      panel_n=lay.N, use_pallas=False)
    out_ref, _ = solver_ref(dyn, state, forcing, area, vol, snow)

    solver_fused = make_velocity_solver(cfg, min_dv_edge=mdv,
                                        panel_n=lay.N, use_pallas=True,
                                        panel_mesh=mesh)
    out_fused, _ = solver_fused(dyn, state, forcing, area, vol, snow)

    tol = 1e-11 if dtype == jnp.float64 else 3e-5
    for f in ("u_velocity", "v_velocity", "stress11", "stress22",
              "stress12"):
        a = np.asarray(getattr(out_ref, f))
        b = np.asarray(getattr(out_fused, f))
        s = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b, a, atol=tol * s, err_msg=f)


def test_fused_panel_loop_requires_eligibility():
    """use_fused_panel_loop=True without the mesh object hard-errors."""
    import dataclasses
    from seaice_tpu.dynamics.evp import make_velocity_solver
    mesh, lay, cfg, dyn, area, vol, forcing, state = _problem(
        False, subcycles=2, dtype=jnp.float64, subdiv=2)
    cfg2 = dataclasses.replace(cfg, velocity=dataclasses.replace(
        cfg.velocity, use_fused_panel_loop=True))
    with pytest.raises(ValueError):
        make_velocity_solver(
            cfg2, min_dv_edge=1.0, panel_n=lay.N, use_pallas=True)
