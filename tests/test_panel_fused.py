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
