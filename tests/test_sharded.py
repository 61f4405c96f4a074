"""Sharding-count invariance: the multi-device step must reproduce the
single-device step (the TPU analog of the reference's 16-vs-32-rank
bitwise parallelism test, testing_and_setup/testing/tests/parallelism.py).
Runs on the virtual 8-device CPU mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.config import box_test_config
from seaice_tpu.model import SeaIceModel
from seaice_tpu.parallel import ShardedSeaIceModel, partition_mesh
from seaice_tpu.testcases import box


def _problem(nx=12, subcycles=4):
    cfg = box_test_config(elastic_subcycles=subcycles)
    mesh = box.box_test_mesh(nx, nx)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    return cfg, mesh, area, vol, snow


def test_partition_covers_mesh():
    _, mesh, *_ = _problem()
    part = partition_mesh(mesh, 4)
    seen = np.zeros(mesh.n_cells, bool)
    for b in part.blocks:
        n = b.n_cells_owned
        gid = b.cell_global[:n]
        gid = gid[gid >= 0]
        assert not seen[gid].any(), "cells owned twice"
        seen[gid] = True
    assert seen.all(), "cells unowned"
    # every owned cell's neighbors must be resolved inside the local block
    _, mesh2, *_ = _problem()
    for b in part.blocks:
        lm = b.mesh
        n = b.n_cells_owned
        own = np.nonzero(b.cell_global[:n] >= 0)[0]
        for c in own:
            g = b.cell_global[c]
            n_global = (mesh2.cells_on_cell[g] >= 0).sum()
            n_local = (lm.cells_on_cell[c] >= 0).sum()
            assert n_local == n_global, \
                f"owned cell {g} missing neighbors in local block"


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_matches_single_device(n_shards):
    cfg, mesh, area, vol, snow = _problem()

    # single-device reference
    ref = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    rstate = ref.init_state(area, vol, snow)
    rstep = ref.make_step()
    forcing = box.box_forcing(mesh, t=0.0)
    rout, _ = rstep(ref.tensors, rstate, forcing)

    # sharded
    sm = ShardedSeaIceModel(mesh, cfg, n_shards, dtype=jnp.float64)
    sstate = sm.init_state(area, vol, snow)
    sforcing = sm.scatter_forcing(lambda m: box.box_forcing(m, t=0.0))
    sstep = sm.make_step()
    sout, _ = sstep(sm.tensors, sm.halo, sstate, sforcing)

    u_s, v_s = sm.gather_velocity(sout)
    u_r = np.asarray(rout.velocity.u_velocity)
    v_r = np.asarray(rout.velocity.v_velocity)
    np.testing.assert_allclose(u_s, u_r, atol=1e-12, rtol=1e-10)
    np.testing.assert_allclose(v_s, v_r, atol=1e-12, rtol=1e-10)

    tr_s = sm.gather_tracers(sout)
    for name in ("iceAreaCategory", "iceVolumeCategory"):
        np.testing.assert_allclose(
            tr_s[name], np.asarray(rout.tracers[name]),
            atol=1e-13, rtol=1e-10, err_msg=name)
