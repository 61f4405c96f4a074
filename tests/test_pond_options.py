"""Pond coupling options: snow-liquid -> pond routing
(config_use_snow_liquid_ponds; reference ice_colpkg.F90:2278-2334,
ice_meltpond_cesm.F90:112, ice_meltpond_lvl.F90:158) and the pond
freshwater coupling feedback (config_include_pond_freshwater_feedback;
reference mpas_seaice_column.F:4790-4797)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.column import constants as c


def test_smliq_changes_cesm_pond_answer():
    from seaice_tpu.column.ponds import compute_ponds_cesm
    nb, ncat = 4, 1
    one = jnp.ones((nb, ncat))
    args = dict(dt=3600.0, rfrac=0.5 * one, meltt=0.002 * one,
                melts=0.004 * one, frain=1e-5 * one,
                aicen=0.9 * one, vicen=1.5 * one, vsnon=0.2 * one,
                Tsfcn=-0.5 * one, apnd=0.1 * one, hpnd=0.05 * one)
    a_ref, h_ref = compute_ponds_cesm(**args)
    # meltsliq twice the snow-melt mass -> bigger ponds
    msl = 2.0 * (args["melts"] * c.RHOS + args["frain"] * 3600.0)
    a_sm, h_sm = compute_ponds_cesm(**args, meltsliq=msl)
    assert float((a_sm * h_sm - a_ref * h_ref).min()) > 0.0
    # zero drained liquid -> only the top-melt source remains
    a_z, h_z = compute_ponds_cesm(**args, meltsliq=jnp.zeros_like(msl))
    assert float((a_z * h_z).max()) < float((a_ref * h_ref).min())


def test_smliq_changes_lvl_pond_answer():
    from seaice_tpu.column.ponds import compute_ponds_lvl
    nb, ncat, ni = 3, 1, 7
    one = jnp.ones((nb, ncat))
    qi = jnp.full((nb, ncat, ni), -2.5e8)
    si = jnp.full((nb, ncat, ni), 3.0)
    args = dict(dt=3600.0, rfrac=0.5 * one, meltt=0.002 * one,
                melts=0.004 * one, frain=1e-5 * one,
                Tair=274.0 * one, fsurfn=10.0 * one, dhs=0.0 * one,
                aicen=0.9 * one, vicen=1.5 * one, vsnon=0.0 * one,
                qicen=qi, sicen=si, Tsfcn=-0.1 * one,
                alvl=one, apnd=0.1 * one, hpnd=0.05 * one,
                ipnd=0.0 * one)
    a_ref, h_ref, _, _ = compute_ponds_lvl(**args)
    msl = 3.0 * (args["melts"] * c.RHOS + args["frain"] * 3600.0)
    a_sm, h_sm, _, _ = compute_ponds_lvl(**args, meltsliq=msl)
    assert float((a_sm * h_sm).sum()) > float((a_ref * h_ref).sum())


def _driver_melting_setup(ncat=3, nb=4, pond_scheme="topo", **colkw):
    from seaice_tpu.column import ColumnPhysics
    from seaice_tpu.column.driver import AtmosForcing, OceanForcing
    from seaice_tpu.column.thermo_shared import (
        salinity_profile, melting_temperature,
        ice_enthalpy_from_temperature, snow_enthalpy_from_temperature)
    ni, ns = 7, 1
    col = ColumnPhysics(ncat, ni, pond_scheme=pond_scheme, **colkw)
    area = jnp.full((nb, ncat), 0.9 / ncat)
    S = salinity_profile(ni)
    Sz = jnp.tile(S, (nb, ncat, 1))
    tr = {
        "iceAreaCategory": area,
        "iceVolumeCategory": area * 1.4,
        "snowVolumeCategory": area * 0.15,
        "surfaceTemperature": jnp.full((nb, ncat), -0.2),
        "iceEnthalpy": ice_enthalpy_from_temperature(
            jnp.full((nb, ncat, ni), -1.0), melting_temperature(Sz)),
        "iceSalinity": Sz,
        "snowEnthalpy": snow_enthalpy_from_temperature(
            jnp.full((nb, ncat, ns), -0.5)),
        "pondArea": jnp.full((nb, ncat), 0.2),
        "pondDepth": jnp.full((nb, ncat), 0.05),
        "pondLidThickness": jnp.zeros((nb, ncat)),
    }
    if colkw.get("use_snow_tracers"):
        vsn = tr["snowVolumeCategory"]
        hs = vsn / jnp.maximum(area, 1e-12)
        tr["snowIceMass"] = jnp.broadcast_to(
            (0.8 * c.RHOS * hs)[..., None], (nb, ncat, ns)).copy()
        tr["snowLiquidMass"] = jnp.broadcast_to(
            (50.0 * hs)[..., None], (nb, ncat, ns)).copy()
        tr["snowGrainRadius"] = jnp.full((nb, ncat, ns), 200.0)
    one = jnp.ones((nb,))
    # strong melting forcing
    atm = AtmosForcing(
        air_temperature=278.0 * one, specific_humidity=4e-3 * one,
        u_air=4.0 * one, v_air=0.0 * one, longwave_down=320.0 * one,
        sw_vis_dir=250.0 * one, sw_vis_dif=100.0 * one,
        sw_ir_dir=200.0 * one, sw_ir_dif=80.0 * one,
        rain_rate=2e-5 * one, snow_rate=0.0 * one,
        air_density=1.3 * one, air_level_height=10.0 * one)
    ocn = OceanForcing(
        sst=-1.0 * one, sss=34.0 * one,
        freezing_temperature=-1.8 * one, frzmlt=-30.0 * one,
        mixed_layer_depth=20.0 * one)
    return col, tr, atm, ocn


def test_pond_freshwater_feedback_budget():
    """With the feedback on, the ocean freshwater flux drops by
    exactly fpond * rhofresh (the pond-retained water), everything
    else identical."""
    col_off, tr, atm, ocn = _driver_melting_setup()
    col_on, _, _, _ = _driver_melting_setup(
        include_pond_freshwater_feedback=True)
    tr_off, fl_off = col_off.step_thermodynamics(3600.0, tr, atm, ocn)
    tr_on, fl_on = col_on.step_thermodynamics(3600.0, tr, atm, ocn)
    fpond = np.asarray(fl_off.fpond)          # m/s of pond water
    assert np.abs(fpond).max() > 0.0, "setup must move pond water"
    np.testing.assert_allclose(
        np.asarray(fl_off.fresh) - np.asarray(fl_on.fresh),
        fpond * c.RHOFRESH, rtol=1e-10)
    # state identical — the feedback only redirects the coupler flux
    for k in tr_off:
        np.testing.assert_array_equal(np.asarray(tr_off[k]),
                                      np.asarray(tr_on[k]))


def test_snow_liquid_ponds_change_the_driver_answer():
    # cesm ponds: no capacity-limited drainage, so the pond volume
    # reflects the source water directly
    col_ref, tr, atm, ocn = _driver_melting_setup(
        pond_scheme="cesm", use_snow_tracers=True)
    col_sm, _, _, _ = _driver_melting_setup(
        pond_scheme="cesm", use_snow_tracers=True,
        use_snow_liquid_ponds=True)
    tr_ref, _ = col_ref.step_thermodynamics(3600.0, tr, atm, ocn)
    tr_sm, _ = col_sm.step_thermodynamics(3600.0, tr, atm, ocn)
    a = np.asarray(tr_ref["pondDepth"] * tr_ref["pondArea"])
    b = np.asarray(tr_sm["pondDepth"] * tr_sm["pondArea"])
    assert np.abs(a - b).max() > 1e-8
    assert np.isfinite(b).all()


def test_snow_liquid_ponds_require_snow_tracers():
    from seaice_tpu.column import ColumnPhysics
    with pytest.raises(ValueError, match="snow"):
        ColumnPhysics(3, 7, pond_scheme="topo",
                      use_snow_liquid_ponds=True)


def test_namelist_maps_pond_options():
    from seaice_tpu.namelist import config_from_namelist
    cfg, _ = config_from_namelist({
        "forcing": {"config_include_pond_freshwater_feedback": True},
        "snow": {"config_use_snow_liquid_ponds": True,
                 "config_use_effective_snow_density": True}})
    assert cfg.column.include_pond_freshwater_feedback is True
    assert cfg.column.use_snow_liquid_ponds is True
