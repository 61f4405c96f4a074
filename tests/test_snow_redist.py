"""Wind redistribution of snow across the ITD (reference snow_redist,
ice_snow.F90:119-593): conservation, lead losses, ITDrdg preferential
redeposition, and the model-step wiring."""

import numpy as np
import jax.numpy as jnp

from seaice_tpu.column import constants as c
from seaice_tpu.column.snow import snow_redistribution
from seaice_tpu.column.thermo_shared import snow_enthalpy_from_temperature


def _state(nb=3, ncat=4, ns=3, open_water=0.1, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.random((nb, ncat)) + 0.2
    a = a / a.sum(-1, keepdims=True) * (1.0 - open_water)
    hin = np.linspace(0.4, 3.0, ncat)[None, :] * np.ones((nb, 1))
    vin = a * hin
    hsn = 0.1 + 0.2 * rng.random((nb, ncat))
    vsn = a * hsn
    zq = np.asarray(snow_enthalpy_from_temperature(
        jnp.asarray(-8.0 - 6.0 * rng.random((nb, ncat, ns)))))
    rhos_cmp = np.full((nb, ncat, ns), 200.0)
    return (jnp.asarray(a), jnp.asarray(vin), jnp.asarray(vsn),
            jnp.asarray(zq), jnp.asarray(rhos_cmp))


def test_mass_and_energy_conservation():
    a, vin, vsn, zq, rhos_cmp = _state()
    dt = 3600.0
    wind = jnp.full((3,), 15.0)
    fsnow = jnp.zeros((3,))
    out = snow_redistribution(dt, wind, fsnow, a, vin, vsn, zq,
                              rhos_cmp, scheme="ITDsd")
    ns = zq.shape[-1]
    m0 = np.asarray(c.RHOS * vsn.sum(-1))
    m1 = np.asarray(c.RHOS * out.vsnon.sum(-1))
    # `fresh` carries the ocean mass flux (lead-lost snow included);
    # fsloss is the diagnostic duplicate of the lead loss (reference
    # books both, snow_redist :436,458)
    np.testing.assert_allclose(m0, m1 + np.asarray(out.fresh) * dt,
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.fsloss) * dt,
                               np.asarray(out.fresh) * dt, atol=1e-8)
    e0 = np.asarray((vsn[..., None] * zq / ns).sum((-2, -1)))
    e1 = np.asarray((out.vsnon[..., None] * out.zqsn / ns).sum((-2, -1)))
    np.testing.assert_allclose(e0 - e1, np.asarray(out.fhocn) * dt,
                               rtol=1e-9, atol=1e-5)


def test_wind_moves_snow_and_leads_lose():
    """Strong wind suspends snow; with open water some blows into
    leads (fsloss > 0); calm wind is a no-op."""
    a, vin, vsn, zq, rhos_cmp = _state(open_water=0.3)
    dt = 3600.0
    out = snow_redistribution(dt, jnp.full((3,), 20.0), jnp.zeros((3,)),
                              a, vin, vsn, zq, rhos_cmp)
    assert float(out.fsloss.min()) > 0.0
    calm = snow_redistribution(dt, jnp.zeros((3,)), jnp.zeros((3,)),
                               a, vin, vsn, zq, rhos_cmp)
    np.testing.assert_allclose(np.asarray(calm.vsnon), np.asarray(vsn),
                               atol=1e-14)
    assert float(jnp.abs(calm.fsloss).max()) == 0.0


def test_itdrdg_prefers_ridged_ice():
    """ITDrdg redeposits suspended snow preferentially onto ridged
    categories (the (1+sfac) weighting)."""
    a, vin, vsn, zq, rhos_cmp = _state(seed=2)
    dt = 3600.0
    wind = jnp.full((3,), 18.0)
    z = jnp.zeros((3,))
    # category 3 fully ridged, others fully level
    alvl = jnp.asarray(np.stack([np.array([1.0, 1.0, 1.0, 0.0])] * 3))
    vlvl = alvl
    out = snow_redistribution(dt, wind, z, a, vin, vsn, zq, rhos_cmp,
                              scheme="ITDrdg", alvl=alvl, vlvl=vlvl)
    base = snow_redistribution(dt, wind, z, a, vin, vsn, zq, rhos_cmp,
                               scheme="ITDsd")
    # ridged category gains more under ITDrdg than under uniform ITDsd
    gain_rdg = np.asarray(out.vsnon - vsn)[:, 3]
    gain_sd = np.asarray(base.vsnon - vsn)[:, 3]
    assert (gain_rdg > gain_sd - 1e-14).all()


def test_fresh_snow_wind_compaction():
    """Snowfall under strong wind compacts the top snow layer."""
    a, vin, vsn, zq, rhos_cmp = _state()
    dt = 3600.0
    out = snow_redistribution(dt, jnp.full((3,), 20.0),
                              jnp.full((3,), 1e-4), a, vin, vsn, zq,
                              rhos_cmp)
    top = np.asarray(out.rhos_cmpn[..., 0])
    assert (top >= np.asarray(rhos_cmp[..., 0]) - 1e-12).all()
    assert top.max() > 200.0 + 1.0


def test_model_step_with_snwredist():
    """snwredist='ITDrdg' through the full model step stays finite and
    conserves the abort-gate checks."""
    import jax
    from seaice_tpu.config import (AdvectionConfig, ColumnConfig,
                                   Config, RunConfig,
                                   VelocitySolverConfig)
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.testcases import box
    from seaice_tpu.utils.pytree import replace

    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=3, n_ice_layers=4),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=2, rotate_cartesian_grid=False,
            include_metric_terms=False,
            geostrophic_surface_tilt=False),
        advection=AdvectionConfig(),
        column=ColumnConfig(ktherm=1, use_snow_tracers=True,
                            snwredist="ITDrdg", pond_scheme="lvl"))
    mesh = box.box_test_mesh(5, 5)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    (area, vol, snow, extra, atm, ocn,
     coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
    state = model.init_state(area, vol, snow)
    tr = dict(state.tracers)
    tr.update({k: jnp.asarray(v) for k, v in extra.items()})
    state = replace(state, tracers=tr)
    forcing = box.box_forcing(mesh, t=0.0)
    step = model.make_step()
    for _ in range(2):
        state, diags = step(model.tensors, state, forcing,
                            jax.tree.map(jnp.asarray, atm),
                            jax.tree.map(jnp.asarray, ocn),
                            coszen=jnp.asarray(coszen))
    for k, v in state.tracers.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert np.asarray(state.tracers["snowVolumeCategory"]).min() >= 0.0


def test_bulk_snwredist_flag():
    """snwredist='bulk' reduces accumulated snowfall at high wind and
    books the blown snow as ocean freshwater."""
    import dataclasses
    import jax
    from seaice_tpu.config import box_test_config
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.testcases import box
    from seaice_tpu.utils.pytree import replace as pt_replace

    outs = {}
    for mode in ("none", "bulk"):
        cfg = box_test_config(elastic_subcycles=2)
        cfg = dataclasses.replace(cfg, column=dataclasses.replace(
            cfg.column, use_column_package=True, snwredist=mode))
        mesh = box.box_test_mesh(5, 5)
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        (area, vol, snow, extra, atm, ocn,
         coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
        atm = dataclasses.replace(
            jax.tree.map(jnp.asarray, atm),
            u_air=jnp.full((mesh.n_cells,), 20.0),
            snow_rate=jnp.full((mesh.n_cells,), 1e-6))
        state = model.init_state(area, vol, snow)
        st, diags = model.make_step()(
            model.tensors, state, box.box_forcing(mesh, t=0.0),
            atm, jax.tree.map(jnp.asarray, ocn),
            coszen=jnp.asarray(coszen))
        outs[mode] = (np.asarray(st.tracers["snowVolumeCategory"]),
                      np.asarray(diags["column_fluxes"].fresh))
    # high wind: bulk accumulates less snow, more ocean freshwater
    assert outs["bulk"][0].sum() < outs["none"][0].sum()
    assert outs["bulk"][1].sum() > outs["none"][1].sum()
