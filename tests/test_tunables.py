"""Physics tunables (column/tuning.py): every promoted Registry option
must actually change the answer when moved off its default.

Reference: the options enter the Fortran column package through
colpkg_init_parameters (ice_colpkg.F90:4030-4743); here they flow
ColumnConfig -> model._col_tunables -> ColumnPhysics.tun -> kernels.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from seaice_tpu.column.tuning import Tunables, DEFAULT


def _changed(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return not np.allclose(a, b, rtol=1e-9, atol=0.0)


def test_config_builds_tunables():
    from seaice_tpu.config import ColumnConfig
    from seaice_tpu.model import _col_tunables
    col = ColumnConfig(rapid_mode_critical_ra=5.0,
                       ratio_ridging_work_to_pe=11.0)
    t = _col_tunables(col)
    assert t.rapid_mode_critical_ra == 5.0
    assert t.ratio_ridging_work_to_pe == 11.0
    assert t.max_snow_density == 450.0


def test_mushy_drainage_tunables_change_answer():
    from seaice_tpu.column.mushy_solver import explicit_flow_velocities
    rng = np.random.default_rng(0)
    ni, B = 7, 8
    # warm, salty mush: porosity ~0.15 so the Golden permeability is
    # nonzero and the rapid-mode Rayleigh gate opens
    zSin = jnp.asarray(8.0 + rng.uniform(0, 2, (B, ni)))
    zTin = jnp.asarray(-4.0 + rng.uniform(0, 1, (B, ni)))
    Tsf = jnp.full((B,), -10.0)
    Tbot = jnp.full((B,), -1.8)
    sss = jnp.full((B,), 34.0)
    qocn = jnp.zeros((B,))
    hilyr = jnp.full((B,), 0.2)
    hin = hilyr * ni

    base = explicit_flow_velocities(3600.0, zSin, zTin, Tsf, Tbot,
                                    sss, qocn, hilyr, hin)
    for field, value, idx in [
            ("rapid_mode_channel_radius", 1.0e-3, 0),
            ("rapid_mode_critical_ra", 1.0, 0),
            ("rapid_mode_aspect_ratio", 2.0, 0),
            ("slow_mode_drainage_strength", -5.0e-7, 1),
            ("slow_mode_critical_porosity", 0.2, 1)]:
        tun = dataclasses.replace(DEFAULT, **{field: value})
        out = explicit_flow_velocities(3600.0, zSin, zTin, Tsf, Tbot,
                                       sss, qocn, hilyr, hin, tun=tun)
        assert _changed(out[idx], base[idx]), field


def test_congelation_porosity_changes_growth():
    from seaice_tpu.column.vertical import thickness_changes
    B, ni, ns = 4, 5, 1
    zqin = jnp.full((B, ni), -2.2e8)
    zqsn = jnp.full((B, ns), -1.1e8)
    zSin = jnp.full((B, ni), 5.0)
    hin = jnp.full((B,), 1.0)
    hsn = jnp.full((B,), 0.1)
    fbot = jnp.full((B,), -60.0)        # strong bottom growth
    Tbot = jnp.full((B,), -1.8)
    z = jnp.zeros((B,))
    # growth requires fcondbot < fbot (see NOTES: fbot<=0 is ocean
    # heat melting the bottom)
    args = (3600.0, hin, hsn, zqin, zqsn, zSin, fbot, Tbot,
            z, z + 5.0, z + 5.0, fbot - 100.0)
    kw = dict(fsnow=z, ktherm=2, sss=jnp.full((B,), 34.0))
    a = thickness_changes(*args, **kw)
    b = thickness_changes(*args, **kw, tun=dataclasses.replace(
        DEFAULT, congelation_ice_porosity=0.5))
    assert _changed(a.congel, b.congel)


def test_snow_tunables_change_answer():
    from seaice_tpu.column.snow import (update_snow_radius,
                                        wind_compaction, wind_snow_loss)
    rng = np.random.default_rng(1)
    B, ncat, ns = 6, 3, 1
    rsnw = jnp.asarray(rng.uniform(60, 2000, (B, ncat, ns)))
    aicen = jnp.full((B, ncat), 0.3)
    vicen = jnp.full((B, ncat), 0.5)
    vsnon = jnp.full((B, ncat), 0.05)
    zqsn = jnp.full((B, ncat, ns), -1.1e8)
    tsfc = jnp.full((B, ncat), -20.0)
    zTin1 = jnp.full((B, ncat), -5.0)
    smice = jnp.full((B, ncat, ns), 200.0)
    smliq = jnp.full((B, ncat, ns), 10.0)

    r0, _, _ = update_snow_radius(60.0, rsnw, aicen, vicen, vsnon,
                                  zqsn, tsfc, zTin1, smice, smliq)
    for field, value in [("max_dry_snow_radius", 800.0),
                         ("fallen_snow_radius", 200.0)]:
        tun = dataclasses.replace(DEFAULT, **{field: value})
        r1, _, _ = update_snow_radius(
            60.0, rsnw, aicen, vicen, vsnon, zqsn, tsfc, zTin1,
            smice, smliq, tun=tun)
        assert _changed(r1, r0), field

    wind = jnp.asarray(rng.uniform(5, 25, (B,)))
    # half sub-100 kg/m^3 (the reference resets those to the
    # new-snow density, ice_snow.F90:79), half near the density cap
    rhos_eff = jnp.asarray(
        np.concatenate([rng.uniform(60, 95, B // 2),
                        rng.uniform(400, 445, B - B // 2)]))
    c0 = wind_compaction(3600.0, wind, rhos_eff)
    for field, value in [("max_snow_density", 300.0),
                         ("minimum_wind_compaction", 5.0),
                         ("wind_compaction_factor", 100.0),
                         ("new_snow_density", 150.0)]:
        tun = dataclasses.replace(DEFAULT, **{field: value})
        c1 = wind_compaction(3600.0, wind, rhos_eff, tun=tun)
        assert _changed(c1, c0), field

    snow_rate = jnp.full((B,), 1e-6)
    l0 = wind_snow_loss(wind, snow_rate)[1]
    l1 = wind_snow_loss(wind, snow_rate, tun=dataclasses.replace(
        DEFAULT, minimum_wind_compaction=5.0))[1]
    assert _changed(l1, l0)


def test_ridging_cf_scales_strength():
    from seaice_tpu.column.itd import ice_strength_rothrock
    B, ncat = 5, 5
    rng = np.random.default_rng(2)
    aicen = jnp.asarray(rng.uniform(0.05, 0.18, (B, ncat)))
    vicen = aicen * jnp.asarray(rng.uniform(0.5, 3.0, (B, ncat)))
    aice = aicen.sum(-1)
    aice0 = 1.0 - aice
    from seaice_tpu.column.itd import category_boundaries
    hin_max = category_boundaries(ncat, 0, 1)
    s17 = ice_strength_rothrock(aicen, vicen, aice, aice0, hin_max,
                                Cf=17.0)
    s34 = ice_strength_rothrock(aicen, vicen, aice, aice0, hin_max,
                                Cf=34.0)
    np.testing.assert_allclose(np.asarray(s34), 2.0 * np.asarray(s17),
                               rtol=1e-12)


def test_ustar_min_changes_fbot():
    from seaice_tpu.column.vertical import frzmlt_bottom_lateral
    B = 4
    z = jnp.zeros((B,))
    args = (3600.0, z + 0.9, z - 100.0, z - 0.5, z - 1.8, z, z,
            z - 1e8)
    a = frzmlt_bottom_lateral(*args)
    b = frzmlt_bottom_lateral(*args, tun=dataclasses.replace(
        DEFAULT, min_friction_velocity=0.05))
    assert _changed(a[1], b[1])


def test_kalg_and_hs0_change_dedd():
    from seaice_tpu.column.dedd import shortwave_dedd
    B, ncat, ni, ns = 4, 1, 5, 1
    aicen = jnp.full((B, ncat), 0.9)
    vicen = jnp.full((B, ncat), 1.5)
    vsnon = jnp.full((B, ncat), 0.1)
    tsfc = jnp.full((B, ncat), -5.0)
    one = jnp.ones((B,))
    args = (aicen, vicen, vsnon, tsfc, 0.5 * one,
            100.0 * one, 50.0 * one, 50.0 * one, 20.0 * one, ni, ns)
    base = shortwave_dedd(*args)
    k2 = shortwave_dedd(*args, kalg=6.0)
    assert _changed(k2.fswthru, base.fswthru)
    h2 = shortwave_dedd(*args, hs0=0.3)
    assert _changed(h2.alvdr, base.alvdr)


def test_namelist_reaches_tunables():
    """A namelist file with off-default physics tunables produces a
    Config whose ColumnPhysics receives them."""
    import textwrap
    from seaice_tpu.namelist import config_from_namelist
    nml = textwrap.dedent("""
        &thermodynamics
            config_rapid_model_critical_Ra = 5.0
        /
        &ridging
            config_ratio_ridging_work_to_PE = 10.0
        /
        &snow
            config_max_snow_density = 400.0
        /
        &ocean
            config_min_friction_velocity = 0.001
        /
    """)
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".nml",
                                     delete=False) as f:
        f.write(nml)
        path = f.name
    try:
        cfg, _setup = config_from_namelist(path)
    finally:
        os.unlink(path)
    assert cfg.column.rapid_mode_critical_ra == 5.0
    assert cfg.column.ratio_ridging_work_to_pe == 10.0
    assert cfg.column.max_snow_density == 400.0
    assert cfg.column.min_friction_velocity == 0.001
    from seaice_tpu.model import _col_tunables
    t = _col_tunables(cfg.column)
    assert t.rapid_mode_critical_ra == 5.0
