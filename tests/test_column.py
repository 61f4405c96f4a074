"""Column physics tests: BL99 thermo energy conservation, growth/melt
physics sanity, ITD remap conservation — mirroring the reference's
in-model conservation checks (column_conservation_check, ice_itd.F90:704)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.column import constants as cc
from seaice_tpu.column.thermo_shared import (
    salinity_profile, melting_temperature,
    ice_enthalpy_from_temperature, ice_temperature_from_enthalpy,
    snow_enthalpy_from_temperature, snow_temperature_from_enthalpy)
from seaice_tpu.column.bl99 import temperature_changes
from seaice_tpu.column.vertical import thermo_vertical
from seaice_tpu.column import itd


NI, NS = 7, 1


def _profile_state(nb=4, hin=1.5, hsn=0.1, T0=-5.0):
    """A plausible mid-winter column state, batched [nb]."""
    S = salinity_profile(NI)
    zSin = jnp.asarray(np.tile(S, (nb, 1)))
    Tmlt = melting_temperature(zSin)
    zTin = jnp.asarray(np.tile(np.linspace(T0, -2.0, NI), (nb, 1)))
    zqin = ice_enthalpy_from_temperature(zTin, Tmlt)
    zTsn = jnp.full((nb, NS), T0)
    zqsn = snow_enthalpy_from_temperature(zTsn)
    return zSin, zqin, zTin, zqsn, zTsn


def test_enthalpy_roundtrip():
    S = salinity_profile(NI)
    Tmlt = melting_temperature(jnp.asarray(S))
    T = jnp.asarray(np.linspace(-20.0, -0.5, NI))
    q = ice_enthalpy_from_temperature(T, Tmlt)
    T2 = ice_temperature_from_enthalpy(q, Tmlt)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-8)
    qs = snow_enthalpy_from_temperature(jnp.asarray([-10.0]))
    np.testing.assert_allclose(
        float(snow_temperature_from_enthalpy(qs)[0]), -10.0, atol=1e-10)


def test_bl99_converges_and_conserves():
    nb = 4
    zSin, zqin, zTin, zqsn, zTsn = _profile_state(nb)
    dt = 3600.0
    hilyr = jnp.full((nb,), 1.5 / NI)
    hslyr = jnp.full((nb,), 0.1 / NS)
    Tsf = jnp.full((nb,), -8.0)
    Tbot = jnp.full((nb,), -1.8)
    einit = (hilyr[:, None] * zqin).sum(-1) + (hslyr[:, None] *
                                               zqsn).sum(-1)
    # cold clear night: strong radiative cooling
    res = temperature_changes(
        dt,
        rhoa=jnp.full((nb,), 1.3), flw=jnp.full((nb,), 180.0),
        potT=jnp.full((nb,), 253.0), Qa=jnp.full((nb,), 0.0005),
        shcoef=jnp.full((nb,), 10.0), lhcoef=jnp.full((nb,), 20.0),
        fswsfc=jnp.zeros((nb,)), fswint=jnp.zeros((nb,)),
        Sswabs=jnp.zeros((nb, NS)), Iswabs=jnp.zeros((nb, NI)),
        hilyr=hilyr, hslyr=hslyr, zqin=zqin, zTin=zTin,
        zqsn=zqsn, zTsn=zTsn, zSin=zSin, Tsf=Tsf, Tbot=Tbot,
        einit=einit)
    assert bool(res.converged.all()), "BL99 failed to converge"
    # energy conservation: d(column energy)/dt == net boundary flux
    enew = (hilyr[:, None] * res.zqin).sum(-1) + \
        (hslyr[:, None] * res.zqsn).sum(-1)
    lhs = np.asarray((enew - einit) / dt)
    rhs = np.asarray(res.fcondtopn - res.fcondbot + res.fswint)
    np.testing.assert_allclose(lhs, rhs, atol=cc.FERRMAX)
    # cold forcing must cool the surface below the initial -8 C
    assert float(res.Tsf.max()) < -8.0
    # temperatures must remain physical
    assert float(res.zTin.max()) < 0.0
    assert float(res.zTin.min()) > -40.0


def test_thermo_vertical_growth_and_melt():
    nb = 2
    zSin, zqin, zTin, zqsn, zTsn = _profile_state(nb)
    dt = 3600.0
    aicen = jnp.asarray([0.9, 0.9])
    vicen = aicen * 1.5
    vsnon = aicen * 0.1
    Tsf = jnp.asarray([-8.0, -1.0])
    # column 0: polar night (growth); column 1: warm + sunny (melt)
    res = thermo_vertical(
        dt, aicen, vicen, vsnon, Tsf, zqin, zqsn, zSin,
        flw=jnp.asarray([150.0, 340.0]),
        potT=jnp.asarray([248.0, 278.0]),
        Qa=jnp.asarray([0.0003, 0.004]),
        rhoa=jnp.full((nb,), 1.3),
        fsnow=jnp.zeros((nb,)),
        # fbot <= 0 is ocean heat melting the bottom; growth needs
        # fbot = 0 with conduction carrying heat up through the ice
        fbot=jnp.asarray([0.0, -40.0]),
        Tbot=jnp.full((nb,), -1.8),
        fswsfc=jnp.asarray([0.0, 150.0]),
        fswint=jnp.asarray([0.0, 30.0]),
        Sswabs=jnp.zeros((nb, NS)),
        Iswabs=jnp.asarray(np.stack([np.zeros(NI),
                                     np.full(NI, 30.0 / NI)])),
        shcoef=jnp.full((nb,), 10.0), lhcoef=jnp.full((nb,), 20.0))
    assert bool(res.converged.all())
    hin = np.asarray(res.hin)
    # growth column thickens (congelation), melt column thins
    assert float(res.congel[0]) > 0.0
    assert hin[0] > 1.5
    assert float(res.meltb[1]) > 0.0 or float(res.meltt[1]) > 0.0
    assert hin[1] < 1.5
    # freshwater flux: melting -> positive flux to ocean
    assert float(res.freshn[1]) > 0.0
    assert np.isfinite(np.asarray(res.fhocnn)).all()


def test_category_boundaries():
    h = itd.category_boundaries(5)
    assert h[0] == 0.0
    assert np.all(np.diff(h) > 0)
    # Lipscomb 2001 ncat=5 canonical values ~ [0, .64, 1.39, 2.47, 4.57, 9.3]
    np.testing.assert_allclose(h[1], 0.6445, atol=1e-3)
    np.testing.assert_allclose(h[5], 9.3338, atol=1e-3)


def test_linear_itd_remap_conserves():
    """Growth shifting ice between categories conserves area-integrated
    volume, energy, and snow."""
    rng = np.random.RandomState(3)
    nb, ncat = 16, 5
    h = itd.category_boundaries(ncat)
    mids = 0.5 * (h[:-1] + np.minimum(h[1:], 12.0))
    aicen0 = jnp.asarray(0.15 * rng.rand(nb, ncat))
    hicen0 = jnp.asarray(np.tile(mids, (nb, 1)))
    vicen0 = aicen0 * hicen0
    # growth: thickness increases ~2 cm in every category
    dh = jnp.asarray(0.02 + 0.01 * rng.rand(nb, ncat))
    vicen1 = aicen0 * (hicen0 + dh)
    vsnon = aicen0 * 0.05
    S = salinity_profile(NI)
    tsfc = jnp.asarray(-10.0 + 5 * rng.rand(nb, ncat))
    qin = ice_enthalpy_from_temperature(
        jnp.asarray(-8.0 + 4 * rng.rand(nb, ncat, NI)),
        melting_temperature(jnp.asarray(np.tile(S, (nb, ncat, 1)))))
    qsn = snow_enthalpy_from_temperature(
        jnp.asarray(-9.0 + 4 * rng.rand(nb, ncat, NS)))

    out = itd.linear_itd_remap(
        h, aicen0, vicen0, aicen0, vicen1, vsnon,
        area_tracers={"surfaceTemperature": tsfc},
        ice_tracers={"iceEnthalpy": qin,
                     "iceSalinity": jnp.asarray(np.tile(S,
                                                        (nb, ncat, 1)))},
        snow_tracers={"snowEnthalpy": qsn})
    aicen2, vicen2, vsnon2, at, it_, st = out

    np.testing.assert_allclose(np.asarray(vicen2.sum(-1)),
                               np.asarray(vicen1.sum(-1)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vsnon2.sum(-1)),
                               np.asarray(vsnon.sum(-1)), rtol=1e-12)
    # ice energy conserved: sum over cat of v * mean(q)
    e0 = np.asarray((vicen1[..., None] * qin).sum(axis=(-2, -1)))
    e1 = np.asarray((vicen2[..., None] * it_["iceEnthalpy"]).sum(
        axis=(-2, -1)))
    np.testing.assert_allclose(e1, e0, rtol=1e-11)
    # snow energy conserved
    es0 = np.asarray((vsnon[..., None] * qsn).sum(axis=(-2, -1)))
    es1 = np.asarray((vsnon2[..., None] * st["snowEnthalpy"]).sum(
        axis=(-2, -1)))
    np.testing.assert_allclose(es1, es0, rtol=1e-10)
    # category thickness bounds respected where ice present
    hic = np.asarray(vicen2 / np.maximum(np.asarray(aicen2), 1e-30))
    a2 = np.asarray(aicen2)
    for n in range(ncat):
        sel = a2[:, n] > 1e-8
        if sel.any():
            assert (hic[sel, n] <= h[n + 1] + 0.05).all()
            assert (hic[sel, n] >= h[n] - 0.05).all()


def test_ice_strength():
    a = jnp.asarray([0.0, 0.5, 0.95, 1.0])
    v = jnp.asarray([0.0, 0.5, 2.0, 3.0])
    p = np.asarray(itd.ice_strength_hibler(a, v))
    assert p[0] == 0.0
    assert np.all(np.diff(p) > 0)
    np.testing.assert_allclose(p[3], 2.75e4 * 3.0, rtol=1e-12)


def test_mushy_relations_roundtrip():
    """Mushy liquidus/enthalpy/temperature relations are mutually
    consistent (reference ice_mushy_physics.F90)."""
    from seaice_tpu.column import mushy

    T = jnp.asarray(np.linspace(-25.0, -0.5, 40))
    S = jnp.asarray(np.linspace(1.0, 10.0, 40))
    # T -> q -> T roundtrip
    q = mushy.enthalpy_mush(T, S)
    T2 = mushy.temperature_mush(q, S)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T),
                               atol=1e-6)
    # liquidus roundtrip: S_br(T_liq(S)) == S
    sbr = jnp.asarray(np.linspace(5.0, 200.0, 50))
    tl = mushy.liquidus_temperature(sbr)
    sbr2 = mushy.liquidus_brine_salinity(tl)
    np.testing.assert_allclose(np.asarray(sbr2), np.asarray(sbr),
                               rtol=1e-8)
    # physical sanity
    phi = np.asarray(mushy.liquid_fraction(T, S))
    assert (phi >= 0).all() and (phi <= 1).all()
    # colder -> less liquid
    phi_cold = float(mushy.liquid_fraction(jnp.asarray(-20.0),
                                           jnp.asarray(5.0)))
    phi_warm = float(mushy.liquid_fraction(jnp.asarray(-2.0),
                                           jnp.asarray(5.0)))
    assert phi_cold < phi_warm
    # conductivity between brine and fresh-ice values
    km = np.asarray(mushy.conductivity_mush(q, S))
    assert (km > 0.4).all() and (km < 2.5).all()
    # enthalpy of melting matches enthalpy at the liquidus temperature
    qm = mushy.enthalpy_of_melting(S)
    q_at_liq = mushy.enthalpy_mush(mushy.liquidus_temperature(S), S)
    np.testing.assert_allclose(np.asarray(qm), np.asarray(q_at_liq),
                               rtol=1e-6)


def test_mushy_picard_solver():
    """Mushy Picard heat solve: converges for cold/melting x snow/bare
    columns with energy closure within ferrmax (reference picard_solver,
    ice_therm_mushy.F90:1128)."""
    from seaice_tpu.column.mushy import enthalpy_mush
    from seaice_tpu.column.mushy_solver import temperature_changes_mushy

    nb = 4
    S = salinity_profile(NI)
    zSin = jnp.asarray(np.tile(S, (nb, 1)))
    zTin = jnp.asarray(np.tile(np.linspace(-8.0, -2.0, NI), (nb, 1)))
    zqin = enthalpy_mush(zTin, zSin)
    zqsn = snow_enthalpy_from_temperature(jnp.full((nb, NS), -8.0))
    dt = 3600.0
    hilyr = jnp.full((nb,), 1.5 / NI)
    hslyr = jnp.asarray([0.1, 0.1, 0.0, 0.0])   # snow, snow, bare, bare
    res = temperature_changes_mushy(
        dt, rhoa=jnp.full((nb,), 1.3),
        flw=jnp.asarray([160.0, 320.0, 160.0, 340.0]),
        potT=jnp.asarray([250.0, 272.0, 250.0, 276.0]),
        Qa=jnp.asarray([3e-4, 3e-3, 3e-4, 4e-3]),
        shcoef=jnp.full((nb,), 10.0), lhcoef=jnp.full((nb,), 20.0),
        fswsfc=jnp.asarray([0.0, 50.0, 0.0, 120.0]),
        fswint=jnp.asarray([0.0, 10.0, 0.0, 25.0]),
        Sswabs=jnp.zeros((nb, NS)),
        Iswabs=jnp.asarray(np.stack(
            [np.zeros(NI), np.full(NI, 10 / NI),
             np.zeros(NI), np.full(NI, 25 / NI)])),
        hilyr=hilyr, hslyr=hslyr, zqin=zqin, zSin=zSin, zqsn=zqsn,
        Tsf=jnp.asarray([-10.0, -2.0, -10.0, -0.5]),
        Tbot=jnp.full((nb,), -1.8))
    assert bool(res.converged.all())
    # melting columns pin the surface at 0; cold columns cool below start
    tsf = np.asarray(res.Tsf)
    assert tsf[1] == 0.0 and tsf[3] == 0.0
    assert tsf[0] < -10.0 and tsf[2] < -10.0
    assert float(res.zTin.max()) <= 1e-9
    # energy closure
    hil, hsl = np.asarray(hilyr), np.asarray(hslyr)
    lsnow = hsl > 1e-4
    e0 = (hil[:, None] * np.asarray(zqin)).sum(-1) + \
        (hsl[:, None] * np.asarray(zqsn)).sum(-1) * lsnow
    e1 = (hil[:, None] * np.asarray(res.zqin)).sum(-1) + \
        (hsl[:, None] * np.asarray(res.zqsn)).sum(-1) * lsnow
    lhs = (e1 - e0) / dt
    rhs = np.asarray(res.fcondtopn - res.fcondbot) + \
        np.asarray([0.0, 10.0, 0.0, 25.0])
    assert (np.abs(lhs - rhs) < 2e-3).all()


def test_zerolayer_temperature():
    """0-layer surface balance (ktherm=0, reference ice_therm_0layer):
    cold forcing cools the surface; equilibrium satisfies
    fsurf = kh (Tsf - Tbot)."""
    from seaice_tpu.column.zerolayer import (KSEAICE_0LAYER,
                                             zerolayer_temperature)
    from seaice_tpu.column import constants as c0

    nb = 3
    res = zerolayer_temperature(
        3600.0,
        rhoa=jnp.full((nb,), 1.3),
        flw=jnp.asarray([160.0, 300.0, 340.0]),
        potT=jnp.asarray([250.0, 270.0, 278.0]),
        Qa=jnp.asarray([3e-4, 2e-3, 4e-3]),
        shcoef=jnp.full((nb,), 10.0), lhcoef=jnp.full((nb,), 20.0),
        fswsfc=jnp.asarray([0.0, 30.0, 150.0]),
        hilyr=jnp.full((nb,), 1.5), hslyr=jnp.asarray([0.1, 0.1, 0.0]),
        Tsf=jnp.full((nb,), -5.0), Tbot=jnp.full((nb,), -1.8))
    assert bool(res.converged.all())
    tsf = np.asarray(res.Tsf)
    assert tsf[0] < -15.0          # polar night cools strongly
    assert tsf[2] == 0.0 or tsf[2] > -1.0   # warm sunny -> near melting
    # balance residual at the solution (cold columns)
    kratio = KSEAICE_0LAYER / c0.KSNO
    heff = 1.5 + kratio * np.array([0.1, 0.1, 0.0])
    kh = KSEAICE_0LAYER / heff
    res_bal = np.asarray(res.fsurfn) - kh * (tsf - (-1.8))
    assert abs(res_bal[0]) < 0.5    # W/m^2


def test_snow_physics():
    """Snow metamorphism/drainage/wind (reference ice_snow.F90)."""
    from seaice_tpu.column import snow as sn

    nb, ncat, ns = 4, 2, 1
    rsnw = jnp.full((nb, ncat, ns), sn.RSNW_FALL)
    aicen = jnp.full((nb, ncat), 0.5)
    vicen = aicen * 1.5
    vsnon = aicen * 0.2
    zqsn = snow_enthalpy_from_temperature(jnp.full((nb, ncat, ns),
                                                   -10.0))
    smice = jnp.full((nb, ncat, ns), 330.0)
    smliq = jnp.zeros((nb, ncat, ns))
    r1, si, sl = sn.update_snow_radius(
        86400.0, rsnw, aicen, vicen, vsnon, zqsn,
        jnp.full((nb, ncat), -15.0), jnp.full((nb, ncat), -5.0),
        smice, smliq)
    # dry metamorphism grows grains, bounded
    assert float(r1.min()) > sn.RSNW_FALL
    assert float(r1.max()) <= sn.RSNW_TMAX
    # wet snow grows faster than dry
    r_wet, _, _ = sn.update_snow_radius(
        86400.0, rsnw, aicen, vicen, vsnon, zqsn,
        jnp.full((nb, ncat), -1.0), jnp.full((nb, ncat), -1.0),
        smice, jnp.full((nb, ncat, ns), 30.0))
    assert float(r_wet.mean()) > float(r1.mean())
    # drainage: saturated snow sheds liquid to the base
    wet = jnp.full((nb, ncat, ns), 120.0)
    sl2, meltsliq = sn.drain_snow(3600.0, vsnon, aicen, smice, wet)
    assert float(meltsliq.min()) > 0.0
    assert float(sl2.max()) < 120.0
    # wind loss caps at 30%
    kept, lost = sn.wind_snow_loss(jnp.asarray([0.0, 25.0]),
                                   jnp.asarray([1e-5, 1e-5]))
    assert float(lost[0]) == 0.0
    np.testing.assert_allclose(float(lost[1]), 0.3e-5, rtol=1e-6)


def test_aerosol_conservation():
    """Aerosol pool transfers conserve total mass (pools + ocean flux)
    (reference update_aerosol, ice_aerosol.F90)."""
    from seaice_tpu.column.aerosol import update_aerosol

    rng = np.random.RandomState(0)
    nb, ncat, na = 5, 3, 2
    aero = jnp.asarray(rng.rand(nb, ncat, na, 4) * 1e-6)
    aicen = jnp.asarray(0.2 + 0.1 * rng.rand(nb, ncat))
    vicen = aicen * 1.5
    vsnon = aicen * 0.15
    dt = 3600.0
    melts = jnp.full((nb, ncat), 1e-3)
    meltt = jnp.full((nb, ncat), 5e-4)
    meltb = jnp.full((nb, ncat), 1e-3)
    dep = jnp.asarray(rng.rand(nb, na) * 1e-12)
    res = update_aerosol(dt, aero, aicen, vicen, vsnon,
                         melts, meltt, meltb,
                         jnp.zeros((nb, ncat)), jnp.zeros((nb, ncat)),
                         jnp.zeros((nb, ncat)), dep)
    assert float(res.aero.min()) >= 0.0
    # mass balance per species: area-weighted pools + ocean flux = input
    m0 = np.asarray((aero.sum(-1) * aicen[..., None]).sum(1))
    m1 = np.asarray((res.aero.sum(-1) * aicen[..., None]).sum(1))
    dep_total = np.asarray(dep) * dt * np.asarray(aicen).sum(
        1, keepdims=True)
    ocn = np.asarray(res.flux_ocn) * dt
    np.testing.assert_allclose(m1 + ocn, m0 + dep_total, rtol=1e-10)


def test_skl_bgc():
    """Skeletal-layer algae: light+nutrient-limited growth, nutrient
    drawdown (reference ice_algae.F90 skl mode)."""
    from seaice_tpu.column.bgc import init_skl_bgc, step_skl_bgc

    nb, ncat = 4, 2
    st = init_skl_bgc((nb, ncat))
    aicen = jnp.full((nb, ncat), 0.45)
    vicen = aicen * 1.5
    no3_o = jnp.full((nb, ncat), 5.0)
    sio3_o = jnp.full((nb, ncat), 10.0)
    # spring: light available
    res = None
    for _ in range(48):
        res = step_skl_bgc(3600.0, st, aicen, vicen,
                           jnp.full((nb, ncat), 5.0),
                           jnp.full((nb, ncat), -1.8), no3_o, sio3_o)
        st = res.state
    assert float(st.algalN.min()) > 0.16      # bloom grows
    assert float(res.chlorophyll.min()) > 0.0
    assert float(st.NO3.max()) <= 5.0 + 1e-9  # nutrients drawn down
    # polar night: no growth
    st2 = init_skl_bgc((nb, ncat))
    a0 = float(st2.algalN.mean())
    for _ in range(48):
        res2 = step_skl_bgc(3600.0, st2, aicen, vicen,
                            jnp.zeros((nb, ncat)),
                            jnp.full((nb, ncat), -1.8), no3_o, sio3_o)
        st2 = res2.state
    assert float(st2.algalN.mean()) < a0      # mortality dominates


# -- delta-Eddington shortwave (reference ice_shortwave.F90 shortwave_dEdd
# :1680-2600, solution_dEdd :3140-3610) -------------------------------------

class TestDeltaEddington:
    def _forcing(self, nb, ncat):
        one = jnp.ones((nb, ncat))
        return dict(swvdr=100.0 * one[..., 0], swvdf=80.0 * one[..., 0],
                    swidr=90.0 * one[..., 0], swidf=60.0 * one[..., 0])

    def test_energy_closure_and_albedo_ordering(self):
        from seaice_tpu.column import shortwave_dedd
        nb = 4
        # columns: thin bare / thick bare / thin snow / thick snow
        hi = jnp.array([0.3, 2.5, 1.5, 1.5])[:, None]
        hs = jnp.array([0.0, 0.0, 0.05, 0.4])[:, None]
        aicen = jnp.ones((nb, 1))
        f = self._forcing(nb, 1)
        sw = shortwave_dedd(aicen, hi * aicen, hs * aicen,
                            jnp.full((nb, 1), -5.0),
                            jnp.full((nb,), 0.5), **f, n_ice_layers=7)
        incident = sum(f.values())            # 330 W/m^2
        absorbed = (sw.fswsfc + sw.fswint + sw.fswthru)[:, 0]
        reflected = (sw.alvdr * f["swvdr"] + sw.alvdf * f["swvdf"] +
                     sw.alidr * f["swidr"] + sw.alidf * f["swidf"])[:, 0]
        np.testing.assert_allclose(np.asarray(absorbed + reflected),
                                   incident, rtol=1e-6)
        alb = np.asarray((reflected / incident))
        # thin bare < thick bare < snow-covered; all within physical range
        assert alb[0] < alb[1] < alb[2] <= alb[3]
        assert 0.1 < alb[0] and alb[3] < 0.99
        # thick snow transmits essentially nothing; thin bare ice does
        assert float(sw.fswthru[3, 0]) < 1.0 < float(sw.fswthru[0, 0])
        # interior absorption is distributed over layers and sums to fswint
        np.testing.assert_allclose(
            np.asarray(sw.Iswabs.sum(-1) + sw.Sswabs.sum(-1)),
            np.asarray(sw.fswint), atol=1e-8)

    def test_zenith_and_grain_dependence(self):
        from seaice_tpu.column import shortwave_dedd
        aicen = jnp.ones((1, 1))
        hi, hs = 1.5 * aicen, 0.3 * aicen
        tsf = jnp.full((1, 1), -10.0)
        f = self._forcing(1, 1)
        incident = sum(f.values())

        def alb(mu, rsnw):
            sw = shortwave_dedd(aicen, hi, hs, tsf, jnp.full((1,), mu),
                                **f, n_ice_layers=7,
                                rsnw=jnp.full((1, 1, 1), rsnw))
            refl = (sw.alvdr * f["swvdr"] + sw.alvdf * f["swvdf"] +
                    sw.alidr * f["swidr"] + sw.alidf * f["swidf"])
            return float(refl[0, 0] / incident[0])

        # lower sun -> brighter; bigger grains -> darker (B&L 2007 fig.5)
        assert alb(0.2, 180.0) > alb(0.9, 180.0)
        assert alb(0.5, 100.0) > alb(0.5, 1000.0)

    def test_dedd_in_column_driver(self):
        """shortwave='dEdd' wired through ColumnPhysics (driver path)."""
        from seaice_tpu.column import ColumnPhysics
        from seaice_tpu.column.driver import AtmosForcing, OceanForcing
        from seaice_tpu.column.thermo_shared import (
            salinity_profile, melting_temperature,
            ice_enthalpy_from_temperature, snow_enthalpy_from_temperature)
        nb, ncat, ni, ns = 3, 5, 7, 1
        col = ColumnPhysics(ncat, ni, shortwave="dEdd")
        area = jnp.full((nb, ncat), 0.8 / ncat)
        S = salinity_profile(ni)
        Sz = jnp.tile(S, (nb, ncat, 1))
        tr = {
            "iceAreaCategory": area,
            "iceVolumeCategory": area * 1.2,
            "snowVolumeCategory": area * 0.1,
            "surfaceTemperature": jnp.full((nb, ncat), -12.0),
            "iceEnthalpy": ice_enthalpy_from_temperature(
                jnp.full((nb, ncat, ni), -8.0), melting_temperature(Sz)),
            "iceSalinity": Sz,
            "snowEnthalpy": snow_enthalpy_from_temperature(
                jnp.full((nb, ncat, ns), -10.0)),
        }
        one = jnp.ones((nb,))
        atm = AtmosForcing(
            air_temperature=255.0 * one, specific_humidity=0.0004 * one,
            u_air=5.0 * one, v_air=0.0 * one, longwave_down=180.0 * one,
            sw_vis_dir=50.0 * one, sw_vis_dif=30.0 * one,
            sw_ir_dir=40.0 * one, sw_ir_dif=20.0 * one,
            rain_rate=0.0 * one, snow_rate=1e-5 * one,
            air_density=1.3 * one, air_level_height=10.0 * one)
        ocn = OceanForcing(
            sst=-1.7 * one, sss=34.0 * one,
            freezing_temperature=-1.8 * one, frzmlt=0.0 * one,
            mixed_layer_depth=20.0 * one)
        step = jax.jit(
            lambda t: col.step_thermodynamics(
                3600.0, t, atm, ocn, coszen=jnp.full((nb,), 0.5)))
        tr2, fluxes = step(tr)
        for v in jax.tree.leaves(tr2):
            assert np.isfinite(np.asarray(v)).all()
        a2 = np.asarray(tr2["iceAreaCategory"].sum(-1))
        assert (a2 >= -1e-12).all() and (a2 <= 1.0 + 1e-12).all()
        assert np.isfinite(np.asarray(fluxes.fhocn)).all()


# -- level-ice melt ponds (reference ice_meltpond_lvl.F90) ------------------

class TestLevelPonds:
    def _cols(self, nb=4):
        ni = 7
        aicen = jnp.full((nb, 1), 0.9)
        vicen = aicen * jnp.array([1.5, 1.5, 1.5, 0.005])[:, None]
        vsnon = jnp.zeros((nb, 1))
        from seaice_tpu.column.thermo_shared import (
            salinity_profile, melting_temperature,
            ice_enthalpy_from_temperature)
        S = salinity_profile(ni)
        Sz = jnp.tile(S, (nb, 1, 1))
        qicen = ice_enthalpy_from_temperature(
            jnp.full((nb, 1, ni), -2.0), melting_temperature(Sz))
        return aicen, vicen, vsnon, qicen, Sz

    def test_growth_refreeze_drain_shed(self):
        from seaice_tpu.column import compute_ponds_lvl
        nb = 4
        aicen, vicen, vsnon, qicen, Sz = self._cols(nb)
        alvl = jnp.full((nb, 1), 0.8)
        z = jnp.zeros((nb, 1))
        # melt only on rows 0-1; row 3 is thin ice carrying a pond
        meltt = jnp.array([0.01, 0.01, 0.0, 0.0])[:, None]
        apnd0 = jnp.array([0.0, 0.0, 0.5, 0.5])[:, None]
        hpnd0 = jnp.array([0.0, 0.0, 0.1, 0.1])[:, None]
        apnd, hpnd, ipnd, ffrac = compute_ponds_lvl(
            3600.0, 0.7, meltt, z, z, jnp.full((nb, 1), 270.0),
            50.0 * jnp.ones((nb, 1)), z, aicen, vicen, vsnon,
            qicen, Sz, jnp.full((nb, 1), -1.0), alvl,
            apnd0, hpnd0, z, dpscale=0.0)
        # melt rows grow a pond; shape relation hpnd = aspect*apnd
        assert float(apnd[0, 0]) > 0 and float(hpnd[0, 0]) > 0
        np.testing.assert_allclose(np.asarray(hpnd[0]),
                                   0.8 * np.asarray(apnd[0] * alvl[0]),
                                   rtol=1e-6)
        # thin ice sheds its pond
        assert float(apnd[3, 0]) == 0.0 and float(hpnd[3, 0]) == 0.0
        # no melt, warm air, fsurf>0 on a snow-free pond: ffrac reported
        assert float(ffrac[2, 0]) >= 0.0

        # Stefan lid growth: freezing air, no melt -> ipnd grows and
        # pond volume drops
        apnd2, hpnd2, ipnd2, _ = compute_ponds_lvl(
            3600.0, 0.7, z, z, z, jnp.full((nb, 1), 250.0), z, z,
            aicen, vicen, vsnon, qicen, Sz,
            jnp.full((nb, 1), -10.0), alvl, apnd0, hpnd0, z,
            dpscale=0.0)
        assert float(ipnd2[2, 0]) > 0.0
        vol0 = float((hpnd0 * apnd0 * alvl * aicen)[2, 0])
        vol2 = float((hpnd2 * apnd2 * alvl * aicen)[2, 0])
        assert vol2 < vol0

        # permeable warm ice drains under Darcy flushing; note that with
        # the BL99 salinity profile the top layer is nearly fresh, so
        # min-phi is impermeable (as in the reference) — use uniform
        # salty, warm ice here
        from seaice_tpu.column.thermo_shared import (
            melting_temperature, ice_enthalpy_from_temperature)
        Sz_warm = jnp.full(Sz.shape, 5.0)
        q_warm = ice_enthalpy_from_temperature(
            jnp.full(qicen.shape, -0.6), melting_temperature(Sz_warm))
        apnd3, hpnd3, _, _ = compute_ponds_lvl(
            3600.0, 0.7, z, z, z, jnp.full((nb, 1), 274.0), z, z,
            aicen, vicen, vsnon, q_warm, Sz_warm,
            jnp.full((nb, 1), -0.5), alvl, apnd0, hpnd0, z,
            frzpnd="cesm", dpscale=1.0e3)
        vol3 = float((hpnd3 * apnd3 * alvl * aicen)[2, 0])
        apnd4, hpnd4, _, _ = compute_ponds_lvl(
            3600.0, 0.7, z, z, z, jnp.full((nb, 1), 274.0), z, z,
            aicen, vicen, vsnon, q_warm, Sz_warm,
            jnp.full((nb, 1), -0.5), alvl, apnd0, hpnd0, z,
            frzpnd="cesm", dpscale=0.0)
        vol4 = float((hpnd4 * apnd4 * alvl * aicen)[2, 0])
        assert vol3 < vol4
        # impermeable profile (fresh surface layer) must not drain
        from seaice_tpu.column import brine_permeability
        assert float(brine_permeability(qicen, Sz)[2, 0]) == 0.0

    def test_ridging_destroys_level_ice(self):
        from seaice_tpu.column.ridging import ridge_ice
        from seaice_tpu.column.itd import category_boundaries
        nb, ncat = 2, 5
        hin_max = category_boundaries(ncat)
        aicen = jnp.full((nb, ncat), 0.199)       # nearly full cover
        vicen = aicen * jnp.array([0.3, 0.8, 1.5, 2.5, 4.0])
        vsnon = aicen * 0.05
        alvl = jnp.ones((nb, ncat))
        conv = jnp.array([1e-6, 0.0])             # strong convergence
        res = ridge_ice(1800.0, hin_max, conv, jnp.zeros((nb,)),
                        aicen, vicen, vsnon,
                        {"levelIceArea": alvl}, {}, {})
        a1, alvl1 = res.aicen, res.area_tracers["levelIceArea"]
        # ice volume conserved, area compressed
        np.testing.assert_allclose(
            np.asarray(res.vicen.sum(-1)), np.asarray(vicen.sum(-1)),
            rtol=1e-12)
        assert float(a1[0].sum()) < float(aicen[0].sum())
        # level ice area decreases strictly (ridged ice is deformed)
        lvl0 = float((alvl * aicen)[0].sum())
        lvl1 = float((alvl1 * a1)[0].sum())
        assert lvl1 < lvl0 - 1e-6
        assert (np.asarray(alvl1) <= 1.0 + 1e-12).all()
        assert (np.asarray(alvl1) >= -1e-12).all()
        # undisturbed row unchanged
        np.testing.assert_allclose(np.asarray(alvl1[1]), 1.0)


# -- topographic melt ponds (reference ice_meltpond_topo.F90) ---------------

class TestTopoPonds:
    def _state(self, nb=3, ncat=5):
        from seaice_tpu.column.thermo_shared import (
            salinity_profile, melting_temperature,
            ice_enthalpy_from_temperature)
        ni = 7
        aicen = jnp.full((nb, ncat), 0.19)
        hicen = jnp.array([0.4, 0.9, 1.6, 2.8, 4.5])
        vicen = aicen * hicen
        vsnon = aicen * 0.02
        S = salinity_profile(ni)
        Sz = jnp.tile(S, (nb, ncat, 1))
        qicen = ice_enthalpy_from_temperature(
            jnp.full((nb, ncat, ni), -5.0), melting_temperature(Sz))
        return aicen, vicen, vsnon, qicen, Sz

    def test_fill_budget_and_topography(self):
        from seaice_tpu.column import compute_ponds_topo
        nb, ncat = 3, 5
        aicen, vicen, vsnon, qicen, Sz = self._state(nb, ncat)
        # rows: modest pond / large pond (hits capacity) / tiny (inactive)
        apnd0 = jnp.array([[0.3] * ncat, [0.9] * ncat, [0.0] * ncat])
        hpnd0 = jnp.array([[0.05] * ncat, [3.0] * ncat, [0.0] * ncat])
        z = jnp.zeros((nb, ncat))
        Tsfc = jnp.full((nb, ncat), -5.0)
        apnd, hpnd, ipnd, dfpond, drain = compute_ponds_topo(
            3600.0, aicen, vicen, vsnon, jnp.zeros((nb,)),
            jnp.full((nb,), 10.0), Tsfc, qicen, Sz, apnd0, hpnd0, z)
        volp0 = np.asarray((hpnd0 * apnd0 * aicen).sum(-1))
        volp1 = np.asarray((hpnd * apnd * aicen).sum(-1))
        vuin1 = np.asarray((ipnd * apnd * aicen).sum(-1))
        # liquid pond budget closes: final = initial + dfpond - lid
        np.testing.assert_allclose(volp1 + vuin1,
                                   volp0 + np.asarray(dfpond),
                                   atol=1e-10)
        assert (np.asarray(drain) >= 0).all()
        # row 1 overfilled -> must have drained a lot
        assert float(drain[1]) > 0.1
        # row 2 has no pond -> everything stays zero
        assert float(volp1[2]) == 0.0
        # hydrostatic levelling: pond deeper on thinner categories
        h1 = np.asarray(hpnd[0])
        occupied = np.asarray(apnd[0]) > 0
        assert occupied[0], "thinnest category must pond first"
        assert not occupied[-1], "thickest category never ponds"
        hw = h1[occupied]
        assert (np.diff(hw) <= 1e-10).all(), \
            "pond depth must decrease with floor height"

    def test_lid_freeze_and_melt(self):
        from seaice_tpu.column import compute_ponds_topo
        nb, ncat = 2, 5
        aicen, vicen, vsnon, qicen, Sz = self._state(nb, ncat)
        apnd0 = jnp.full((nb, ncat), 0.4)
        hpnd0 = jnp.full((nb, ncat), 0.15)
        ip0 = jnp.zeros((nb, ncat))
        # cold surface, negative surface flux -> a lid forms
        Tsfc_cold = jnp.full((nb, ncat), -8.0)
        _, _, ipnd_c, _, _ = compute_ponds_topo(
            3600.0, aicen, vicen, vsnon, jnp.zeros((nb,)),
            jnp.full((nb,), -50.0), Tsfc_cold, qicen, Sz,
            apnd0, hpnd0, ip0)
        assert float(jnp.max(ipnd_c)) > 0.0
        # warm surface + meltwater -> an existing lid melts back
        ip_exist = jnp.full((nb, ncat), 0.05)
        a1, h1, ipnd_w, dfp, _ = compute_ponds_topo(
            3600.0, aicen, vicen, vsnon, jnp.full((nb,), 0.02),
            jnp.full((nb,), 100.0), jnp.full((nb, ncat), -0.05),
            qicen, Sz, apnd0, hpnd0, ip_exist)
        lid0 = float((ip_exist * apnd0 * aicen)[0].sum())
        lid1 = float((ipnd_w * a1 * aicen)[0].sum())
        assert lid1 < lid0

    def test_jit_and_finite(self):
        from seaice_tpu.column import compute_ponds_topo
        nb, ncat = 4, 5
        aicen, vicen, vsnon, qicen, Sz = self._state(nb, ncat)
        apnd0 = jnp.full((nb, ncat), 0.2)
        hpnd0 = jnp.full((nb, ncat), 0.1)
        f = jax.jit(lambda *a: compute_ponds_topo(3600.0, *a))
        out = f(aicen, vicen, vsnon, jnp.zeros((nb,)),
                jnp.zeros((nb,)), jnp.full((nb, ncat), -3.0),
                qicen, Sz, apnd0, hpnd0, jnp.zeros((nb, ncat)))
        for v in out:
            assert np.isfinite(np.asarray(v)).all()


# -- mushy gravity drainage + flushing (reference ice_therm_mushy.F90
# explicit_flow_velocities :3005, flushing_velocity :3182,
# solve_salinity :2855) ------------------------------------------------------

class TestMushyDrainage:
    def test_rapid_mode_rayleigh_gated(self):
        from seaice_tpu.column.mushy_solver import (
            explicit_flow_velocities, solve_salinity)
        from seaice_tpu.column import mushy
        ni = 7
        sss = jnp.full((1,), 30.0)
        qocn = mushy.enthalpy_brine(jnp.full((1,), -1.8))

        def flow(zT, zS, h):
            hilyr = jnp.full((1,), h / ni)
            return explicit_flow_velocities(
                3600.0, zS, zT, jnp.full((1,), -5.0),
                jnp.full((1,), -1.8), sss, qocn, hilyr, hilyr * ni)

        # young warm salty ice: convectively unstable -> q > 0
        zT_warm = jnp.tile(jnp.linspace(-3.0, -1.9, ni), (1, 1))
        q_w, dS_w, Sbr_w, _, phi_w = flow(
            zT_warm, jnp.full((1, ni), 14.0), 0.5)
        assert float(q_w.max()) > 0.0
        # cold low-porosity ice: Rayleigh-subcritical -> q == 0
        zT_cold = jnp.tile(jnp.linspace(-20.0, -4.0, ni), (1, 1))
        q_c, _, _, _, _ = flow(zT_cold, jnp.full((1, ni), 5.0), 2.0)
        np.testing.assert_array_equal(np.asarray(q_c), 0.0)
        # slow mode desalinates growing ice (Tbot > Tsf)
        assert float(dS_w.max()) < 0.0
        # salinity update: desalination, never below S_min
        hilyr = jnp.full((1,), 0.5 / ni)
        zS0 = jnp.full((1, ni), 14.0)
        zS1 = zS0
        for _ in range(200):
            zS1 = solve_salinity(3600.0, zS1, Sbr_w, jnp.zeros((1,)),
                                 sss, q_w, dS_w, jnp.zeros((1,)), hilyr)
        assert float(zS1.max()) < 14.0
        assert float(zS1.min()) >= 0.01 - 1e-12

    def test_flushing_velocity_requires_head_and_permeability(self):
        from seaice_tpu.column.mushy_solver import flushing_velocity
        ni = 7
        hilyr = jnp.full((2,), 1.5 / ni)
        hin = hilyr * ni
        zT = jnp.full((2, ni), -1.0)
        # row 0 permeable, row 1 impermeable (phi < 0.05)
        phi = jnp.stack([jnp.full((ni,), 0.25), jnp.full((ni,), 0.03)])
        w = flushing_velocity(3600.0, zT, phi, hin, jnp.zeros((2,)),
                              hilyr, jnp.full((2,), 0.2),
                              jnp.full((2,), 0.4))
        assert float(w[0]) > 0.0
        assert float(w[1]) == 0.0
        # no pond -> no flushing
        w2 = flushing_velocity(3600.0, zT, phi, hin, jnp.zeros((2,)),
                               hilyr, jnp.zeros((2,)), jnp.zeros((2,)))
        assert float(jnp.abs(w2).max()) == 0.0

    def test_solver_with_drainage_converges_and_desalinates(self):
        from seaice_tpu.column.mushy_solver import \
            temperature_changes_mushy
        from seaice_tpu.column import mushy
        nb, ni, ns = 3, 7, 1
        zTin = jnp.tile(jnp.linspace(-12.0, -2.2, ni), (nb, 1))
        S = jnp.full((nb, ni), 8.0)
        zqin = mushy.enthalpy_mush(zTin, S)
        hilyr = jnp.full((nb,), 1.2 / ni)
        zqsn = jnp.full((nb, ns), -0.5e8)
        Tsf = jnp.full((nb,), -15.0)
        args = dict(rhoa=jnp.full((nb,), 1.3),
                    flw=jnp.full((nb,), 180.0),
                    potT=jnp.full((nb,), 250.0),
                    Qa=jnp.full((nb,), 0.0004),
                    shcoef=jnp.full((nb,), 10.0),
                    lhcoef=jnp.full((nb,), 20.0),
                    fswsfc=jnp.zeros((nb,)), fswint=jnp.zeros((nb,)),
                    Sswabs=jnp.zeros((nb, ns)),
                    Iswabs=jnp.zeros((nb, ni)))
        step = jax.jit(lambda zq, zS, T: temperature_changes_mushy(
            3600.0, hilyr=hilyr, hslyr=jnp.zeros((nb,)), zqin=zq,
            zSin=zS, zqsn=zqsn, Tsf=T, Tbot=jnp.full((nb,), -1.8),
            sss=jnp.full((nb,), 32.0), **args))
        for i in range(24):
            res = step(zqin, S, Tsf)
            assert bool(res.converged.all())
            zqin, S, Tsf = res.zqin, res.zSin, res.Tsf
        assert float(S.mean()) < 8.0          # slow-mode desalination
        assert np.isfinite(np.asarray(res.fadvheat)).all()
        # no-drainage call still works and leaves salinity untouched
        res0 = temperature_changes_mushy(
            3600.0, hilyr=hilyr, hslyr=jnp.zeros((nb,)), zqin=zqin,
            zSin=S, zqsn=zqsn, Tsf=Tsf, Tbot=jnp.full((nb,), -1.8),
            **args)
        np.testing.assert_array_equal(np.asarray(res0.zSin),
                                      np.asarray(S))
        assert float(jnp.abs(res0.w).max()) == 0.0

    def test_warm_thin_ice_converges_energy_exact(self):
        """Warm summer profile that oscillated under per-iteration phi
        refresh; the reference-faithful frozen-phi solve converges with
        machine-exact energy closure including drainage + flushing."""
        from seaice_tpu.column.mushy_solver import \
            temperature_changes_mushy
        from seaice_tpu.column import mushy
        nb, ni, ns = 4, 7, 1
        zTin = jnp.tile(jnp.linspace(-6.0, -2.0, ni), (nb, 1))
        S = jnp.full((nb, ni), 10.0)
        zqin = mushy.enthalpy_mush(zTin, S)
        hilyr = jnp.full((nb,), 0.8 / ni)
        res = temperature_changes_mushy(
            3600.0, rhoa=jnp.full((nb,), 1.3),
            flw=jnp.full((nb,), 200.0), potT=jnp.full((nb,), 255.0),
            Qa=jnp.full((nb,), 0.0005), shcoef=jnp.full((nb,), 10.0),
            lhcoef=jnp.full((nb,), 20.0), fswsfc=jnp.zeros((nb,)),
            fswint=jnp.zeros((nb,)), Sswabs=jnp.zeros((nb, ns)),
            Iswabs=jnp.zeros((nb, ni)), hilyr=hilyr,
            hslyr=jnp.zeros((nb,)), zqin=zqin, zSin=S,
            zqsn=jnp.full((nb, ns), -0.5e8),
            Tsf=jnp.full((nb,), -8.0), Tbot=jnp.full((nb,), -1.8),
            sss=jnp.full((nb,), 32.0), hpond=jnp.full((nb,), 0.05),
            apond=jnp.full((nb,), 0.3))
        assert bool(res.converged.all())
        dE = np.asarray((hilyr[:, None] * (res.zqin - zqin)).sum(-1) /
                        3600.0)
        flux = np.asarray(res.fcondtopn - res.fcondbot - res.fadvheat)
        np.testing.assert_allclose(dE, flux, atol=1e-3)
        assert float(res.w.min()) > 0.0    # pond head drives flushing

    def test_flood_ice_snow_ice_formation(self):
        """Heavy snow load floods: snow converts to snow ice, energy
        gained equals the ocean brine energy eadded*dt, freeboard is
        restored (reference flood_ice :3342-3512)."""
        from seaice_tpu.column.mushy_solver import flood_ice
        from seaice_tpu.column import mushy
        nb, ni, ns = 3, 7, 1
        # rows: heavy snow (floods) / light snow (no) / no snow
        hin = jnp.full((nb,), 0.5)
        hsn = jnp.array([0.4, 0.02, 0.0])
        hilyr, hslyr = hin / ni, hsn / ns
        zTin = jnp.full((nb, ni), -5.0)
        zSin = jnp.full((nb, ni), 8.0)
        zqin = mushy.enthalpy_mush(zTin, zSin)
        zqsn = jnp.full((nb, ns), -1.1e8)
        phi = mushy.liquid_fraction(zTin, zSin)
        Sbr = mushy.liquidus_brine_salinity(zTin)
        sss = jnp.full((nb,), 32.0)
        qocn = mushy.enthalpy_brine(jnp.full((nb,), -1.8))
        res = flood_ice(3600.0, hsn, hin, hslyr, hilyr, zqsn, zqin,
                        zSin, phi, Sbr, sss, qocn)
        sn = np.asarray(res.snoice)
        assert sn[0] > 0.0 and sn[1] == 0.0 and sn[2] == 0.0
        # thickness bookkeeping
        np.testing.assert_allclose(float(res.hilyr[0] * ni),
                                   0.5 + sn[0], rtol=1e-12)
        np.testing.assert_allclose(float(res.hslyr[0] * ns),
                                   0.4 - sn[0], rtol=1e-12)
        # energy budget: gain = ocean brine energy folded into new mush
        e0 = float((hilyr[0] * zqin[0]).sum() + (hslyr[0] * zqsn[0]).sum())
        e1 = float((res.hilyr[0] * res.zqin[0]).sum() +
                   (res.hslyr[0] * res.zqsn[0]).sum())
        np.testing.assert_allclose(e1 - e0,
                                   float(res.eadded[0]) * 3600.0,
                                   rtol=1e-9)
        # untouched rows bitwise unchanged
        np.testing.assert_array_equal(np.asarray(res.zqin[1:]),
                                      np.asarray(zqin[1:]))
        # flooding restores non-negative freeboard
        rho_ocn = float(mushy.density_brine(sss)[0])
        mass = float((res.phi[0] * mushy.density_brine(
            mushy.liquidus_brine_salinity(jnp.full((ni,), -5.0))) +
            (1 - res.phi[0]) * 917.0).sum() * res.hilyr[0]) + \
            330.0 * float(res.hslyr[0] * ns)
        assert mass <= rho_ocn * float(res.hilyr[0] * ni) * 1.05


def test_orbital_coszen():
    """Zenith geometry (reference ice_orbital.F90 analog): subsolar
    noon, polar night, and seasonal declination limits."""
    from seaice_tpu.column.orbital import (compute_coszen,
                                           solar_declination)
    # equinox (~day 80): declination near zero, noon at lon 0 ->
    # coszen ~ cos(lat)
    for latd in (0.0, 45.0, 70.0):
        lat = jnp.deg2rad(latd)
        cz, _ = compute_coszen(lat, 0.0, 80.0, 43200.0)
        np.testing.assert_allclose(float(cz), np.cos(np.deg2rad(latd)),
                                   atol=0.03)
    # midnight at lon 0, equator: sun below horizon
    cz, _ = compute_coszen(0.0, 0.0, 80.0, 0.0)
    assert float(cz) == 0.0
    # polar night: 80N in late December, all day dark
    secs = jnp.linspace(0.0, 86400.0, 25)
    cz, _ = compute_coszen(jnp.deg2rad(80.0), 0.0, 355.0, secs)
    assert float(cz.max()) == 0.0
    # midnight sun: 80N in late June, sun up all day
    cz, _ = compute_coszen(jnp.deg2rad(80.0), 0.0, 172.0, secs)
    assert float(cz.min()) > 0.0
    # declination bounds +-23.45 deg; distance factor ~3.4% annual swing
    d = jnp.arange(1.0, 366.0)
    decl, eccf = solar_declination(d)
    assert abs(float(jnp.rad2deg(decl).max()) - 23.45) < 0.3
    assert abs(float(jnp.rad2deg(decl).min()) + 23.45) < 0.3
    assert 1.02 < float(eccf.max()) < 1.04 and 0.96 < float(eccf.min()) < 0.98


def test_form_drag_tsamados():
    """Neutral form drag (reference neutral_drag_coeffs,
    ice_atmo.F90:496-827): ridged ice raises drag above the skin
    value, open water falls back to log-law/dragio defaults, and all
    components stay within the reference caps."""
    from seaice_tpu.column import neutral_drag_coeffs
    import seaice_tpu.column.constants as cc
    nb, ncat = 3, 5
    hcat = jnp.array([0.3, 0.9, 1.6, 2.8, 4.5])
    # rows: heavily ridged pack / fully level pack / open water
    aicen = jnp.stack([jnp.full((ncat,), 0.19),
                       jnp.full((ncat,), 0.19),
                       jnp.zeros((ncat,))])
    vicen = aicen * hcat
    vsnon = aicen * 0.05
    alvl = jnp.stack([jnp.full((ncat,), 0.3),
                      jnp.ones((ncat,)),
                      jnp.zeros((ncat,))])
    apnd = jnp.full((nb, ncat), 0.2)
    hpnd = jnp.full((nb, ncat), 0.1)
    r = neutral_drag_coeffs(apnd, hpnd, alvl, aicen, vicen, vsnon)
    cd_a, cd_o = np.asarray(r.Cdn_atm), np.asarray(r.Cdn_ocn)
    # ridged pack has sails/keels -> higher drag than the level pack
    assert float(r.hridge[0]) > 0.0 and float(r.hridge[1]) == 0.0
    assert cd_a[0] > cd_a[1] and cd_o[0] > cd_o[1]
    # open water: log-law atm default and bare ocean drag
    np.testing.assert_allclose(
        cd_a[2], (cc.VONKAR / np.log(cc.ZREF / cc.ICERUF)) ** 2,
        rtol=1e-12)
    np.testing.assert_allclose(cd_o[2], cc.DRAGIO, rtol=1e-12)
    # caps respected and all components nonnegative
    assert (cd_a <= 0.02 + 1e-15).all() and (cd_o <= 0.06 + 1e-15).all()
    for f in r:
        assert (np.asarray(f) >= -1e-15).all()
    # geometry sanity: keel deeper than sail, draft < mean thickness
    assert float(r.hkeel[0]) > float(r.hridge[0])
    assert float(r.hdraft[0]) < float((vicen[0].sum() + 1e-9) /
                                      aicen[0].sum()) + 0.1


def test_sea_freezing_temperature_options():
    """tfrz_option selector (reference ice_colpkg.F90:1664-1686)."""
    from seaice_tpu.column import sea_freezing_temperature
    sss = jnp.array([0.0, 30.0, 34.0])
    np.testing.assert_allclose(
        np.asarray(sea_freezing_temperature(sss, "minus1p8")), -1.8)
    np.testing.assert_allclose(
        np.asarray(sea_freezing_temperature(sss, "linear_salt")),
        [0.0, -0.054 * 30, -0.054 * 34], rtol=1e-12)
    tf = np.asarray(sea_freezing_temperature(sss, "mushy"))
    assert tf[0] == 0.0            # fresh water freezes at 0
    assert -2.3 < tf[2] < -1.7     # seawater liquidus near -1.9 C
    assert tf[2] < tf[1] < tf[0]   # saltier -> colder


def test_atmo_highfreq_and_formdrag_coupling():
    """highfreq (Roberts 2014 ice-relative wind) and formdrag neutral
    coefficient wiring in the bulk boundary layer (reference
    ice_atmo.F90:175-216, :305-318)."""
    from seaice_tpu.column import atmo_boundary_layer
    nb = 4
    one = jnp.ones((nb,))
    args = dict(Tsf=-5.0 * one, potT=260.0 * one, uatm=8.0 * one,
                vatm=0.0 * one, wind=8.0 * one, zlvl=10.0 * one,
                Qa=0.0005 * one, rhoa=1.3 * one)
    base = atmo_boundary_layer(**args)
    # ice moving with the wind reduces the highfreq stress
    hf = atmo_boundary_layer(**args, highfreq=True,
                             uvel=4.0 * one, vvel=0.0 * one)
    assert float(hf.strx.mean()) < float(base.strx.mean())
    assert float(hf.strx.min()) > 0.0
    # stationary ice: highfreq stress close to the standard bulk value
    hf0 = atmo_boundary_layer(**args, highfreq=True,
                              uvel=0.0 * one, vvel=0.0 * one)
    np.testing.assert_allclose(np.asarray(hf0.strx),
                               np.asarray(base.strx), rtol=0.3)
    # a larger form-drag coefficient raises the exchange coefficients
    fd = atmo_boundary_layer(**args, Cdn_atm=0.004 * one)
    assert float(fd.shcoef.mean()) > float(base.shcoef.mean())
    assert float(fd.strx.mean()) > float(base.strx.mean())
