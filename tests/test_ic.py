"""Idealized initial-condition generators (reference init_ice_state
modes, mpas_seaice_initialize.F:253-1528)."""

import numpy as np
import jax.numpy as jnp

from seaice_tpu.testcases import (box, category_initial_profile,
                                  cice_default, circle_ice,
                                  random_coverage, ridging_band,
                                  special_cells, uniform_ice,
                                  uniform_interior)


def _mesh(nx=8):
    m = box.box_test_mesh(nx, nx)
    m.f_vertex = box.box_coriolis_parameter(m)
    return m


def test_category_profile_parabolic():
    a, h = category_initial_profile(5)
    np.testing.assert_allclose(a.sum(), 1.0, rtol=1e-12)
    assert (a >= 0.0).all()
    # area peaks at the category containing 3 m ice
    assert a.argmax() == int(np.searchsorted(h, 3.0)) - 1 or \
        a.argmax() == min(int(np.searchsorted(h, 3.0)), len(a) - 1)
    assert (np.diff(h) > 0).all()


def test_uniform_and_interior():
    m = _mesh()
    a, v, s, ex = uniform_ice(m, 2, area=0.9, volume=1.5)
    assert a.shape == (m.n_cells, 2)
    np.testing.assert_allclose(a.max(), 0.9)
    ai, vi, si, _ = uniform_interior(m, 1)
    # bounded mesh: boundary cells empty, interior filled
    coc = np.asarray(m.cells_on_cell)
    interior = (coc >= 0).all(-1)
    assert (ai[interior, 0] == 1.0).all()
    assert (ai[~interior, 0] == 0.0).all()
    assert interior.sum() < m.n_cells


def test_circle_and_special_and_ridging():
    m = _mesh(10)
    a, *_ = circle_ice(m, 1)
    assert 0 < a.sum() < m.n_cells       # a disc, not everything
    a2, v2, s2, _ = special_cells(m, cells=(3, 4))
    assert a2.sum() == 2.0
    a3, v3, _, _ = ridging_band(m, 1)
    assert (a3 == 1.0).all()
    x = np.asarray(m.x_cell)
    assert v3[x.argmax(), 0] > v3[x.argmin(), 0]   # thickness ramp


def test_random_coverage_tiny_values():
    m = _mesh()
    a, v, s, ex = random_coverage(m, 1, seed=1)
    nz = a[a > 0]
    assert len(nz) > 0
    assert nz.min() >= 10.0 ** -11 - 1e-15
    assert nz.max() <= 1.0


def test_cice_default_profiles_and_step():
    """cice_default: parabolic profile, capped snow, cold enthalpies;
    the state runs through a full-physics step."""
    import dataclasses
    import jax
    from seaice_tpu.config import box_test_config
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.utils.pytree import replace

    m = _mesh(6)
    ncat, ni = 3, 4
    a, v, s, extra = cice_default(m, ncat, ni, lat_north=-1.0,
                                  lat_south=1.0)
    assert (a.sum(-1) <= 1.0 + 1e-12).all()
    assert (s <= 0.2 * v + 1e-12).all()
    assert (extra["iceEnthalpy"][a > 0.01] < 0).all()   # cold ice

    cfg = box_test_config(elastic_subcycles=2)
    cfg = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, n_categories=ncat,
                                n_ice_layers=ni),
        column=dataclasses.replace(cfg.column,
                                   use_column_package=True))
    model = SeaIceModel(m, cfg, dtype=jnp.float64)
    state = model.init_state(a, v, s)
    tr = dict(state.tracers)
    for k, arr in extra.items():
        if k in tr:
            tr[k] = jnp.asarray(arr)
    state = replace(state, tracers=tr)
    (_, _, _, _, atm, ocn, coszen) = full_physics_inputs(
        m, cfg, jnp.float64)
    step = model.make_step()
    out, _ = step(model.tensors, state, box.box_forcing(m, t=0.0),
                  jax.tree.map(jnp.asarray, atm),
                  jax.tree.map(jnp.asarray, ocn),
                  coszen=jnp.asarray(coszen))
    for k, arr in out.tracers.items():
        assert np.isfinite(np.asarray(arr)).all(), k
