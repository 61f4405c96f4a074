"""Vertical thermodynamics: growth/melt and the per-category driver.

TPU-native re-design of `thermo_vertical`
(`/root/reference/src/column/ice_therm_vertical.F90:53-471`) and its
stages: `init_vertical_profile` (:652), `thickness_changes` (:1026),
`freeboard` (:1755), `adjust_enthalpy`, `frzmlt_bottom_lateral` (:482).
BL99 (ktherm=1) energy accounting; the sequential consume-energy-
through-layers loops are unrolled over the static layer count, fully
vectorized over the [nCells, nCategories] batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import constants as c
from .bl99 import temperature_changes
from .thermo_shared import (ice_enthalpy_from_temperature,
                            ice_temperature_from_enthalpy,
                            melting_temperature,
                            snow_enthalpy_from_temperature,
                            snow_temperature_from_enthalpy)

QBOTMAX = -0.5 * c.RHOI * c.LFRESH


def frzmlt_bottom_lateral(dt, aice, frzmlt, sst, Tf, strocnxT, strocnyT,
                          etot):
    """Ocean-ice bottom heat flux and lateral-melt fraction
    (reference frzmlt_bottom_lateral, ice_therm_vertical.F90:482-641).

    etot: total column energy sum over categories [B] (J/m^2, < 0).
    Returns (Tbot, fbot, rside)."""
    floediam = 300.0
    floeshape = 0.66
    m1, m2 = 1.6e-6, 1.36

    can_melt = (aice > c.PUNY) & (frzmlt < 0.0)
    Tbot = Tf
    deltaT = jnp.maximum(sst - Tbot, 0.0)
    ustar = jnp.sqrt(jnp.sqrt(strocnxT ** 2 + strocnyT ** 2) / c.RHOW)
    ustar = jnp.maximum(ustar, c.USTAR_MIN)
    cpchr = -c.CP_OCN * c.RHOW * 0.006
    fbot = cpchr * deltaT * ustar
    fbot = jnp.maximum(fbot, frzmlt)
    fbot = jnp.where(can_melt, fbot, 0.0)

    wlat = m1 * deltaT ** m2
    rside = wlat * dt * c.PI / (floeshape * floediam)
    rside = jnp.clip(rside, 0.0, 1.0)
    rside = jnp.where(can_melt, rside, 0.0)

    # limit fbot and rside so that heat extracted <= frzmlt
    # (reference :600-630): fside = etot*rside/dt <= 0
    fside = etot * rside / dt
    xtmp = frzmlt / jnp.minimum(fbot + fside, -c.PUNY)
    xtmp = jnp.clip(xtmp, 0.0, 1.0)
    fbot = fbot * xtmp
    rside = rside * xtmp
    return Tbot, fbot, rside


def adjust_enthalpy(dz_old, h_new_layer, h_total, q):
    """Conservative remap of layer quantity q from unequal layers dz_old
    to equal layers of thickness h_new_layer (reference adjust_enthalpy).
    dz_old, q: [*B, n]; h_new_layer, h_total: [*B]."""
    n = q.shape[-1]
    z1 = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(dz_old[..., :1]), dz_old], axis=-1), axis=-1)
    # new interfaces
    k = jnp.arange(n + 1, dtype=q.dtype)
    z2 = h_new_layer[..., None] * k
    z2 = jnp.concatenate([z2[..., :n], h_total[..., None]], axis=-1)
    hq = []
    for k2 in range(n):
        top = z2[..., k2]
        bot = z2[..., k2 + 1]
        acc = 0.0
        for k1 in range(n):
            ov = jnp.maximum(
                0.0, jnp.minimum(z1[..., k1 + 1], bot) -
                jnp.maximum(z1[..., k1], top))
            acc = acc + ov * q[..., k1]
        hq.append(acc)
    hq = jnp.stack(hq, axis=-1)
    return jnp.where(h_new_layer[..., None] > c.PUNY,
                     hq / jnp.maximum(h_new_layer[..., None], c.PUNY),
                     q)


class ThicknessResult(NamedTuple):
    hin: jnp.ndarray
    hsn: jnp.ndarray
    zqin: jnp.ndarray
    zqsn: jnp.ndarray
    efinal: jnp.ndarray
    fhocnn: jnp.ndarray
    evapn: jnp.ndarray
    meltt: jnp.ndarray
    melts: jnp.ndarray
    meltb: jnp.ndarray
    congel: jnp.ndarray
    snoice: jnp.ndarray
    hsn_new: jnp.ndarray


def thickness_changes(dt, hin, hsn, zqin, zqsn, zSin,
                      fbot, Tbot, flatn, fsurfn, fcondtopn, fcondbot,
                      fsnow) -> ThicknessResult:
    """Growth and melt at the surfaces + layer re-gridding (BL99 path of
    reference thickness_changes, ice_therm_vertical.F90:1026-1744)."""
    ni = zqin.shape[-1]
    ns = zqsn.shape[-1]
    hilyr = hin / ni
    hslyr = hsn / ns
    dzi = [hilyr for _ in range(ni)]
    dzs = [hslyr for _ in range(ns)]
    zqin_l = [zqin[..., k] for k in range(ni)]
    zqsn_l = [zqsn[..., k] for k in range(ns)]
    meltt = jnp.zeros_like(hin)
    melts = jnp.zeros_like(hin)
    meltb = jnp.zeros_like(hin)

    # energy budgets (reference :1240-1255)
    wk1 = -flatn * dt
    esub = jnp.maximum(wk1, 0.0)
    econ = jnp.minimum(wk1, 0.0)
    wk1 = (fsurfn - fcondtopn) * dt
    etop_mlt = jnp.maximum(wk1, 0.0)
    wk1 = (fcondbot - fbot) * dt
    ebot_mlt = jnp.maximum(wk1, 0.0)
    ebot_gro = jnp.minimum(wk1, 0.0)

    # condensation (:1257-1267)
    has_snow = hsn > c.PUNY
    dhs = jnp.where(has_snow, econ / (zqsn_l[0] - c.RHOS * c.LVAP), 0.0)
    dhi = jnp.where(has_snow, 0.0, econ / (zqin_l[0] - c.RHOI * c.LVAP))
    dzs[0] = dzs[0] + dhs
    dzi[0] = dzi[0] + dhi
    evapn = dhs * c.RHOS + dhi * c.RHOI

    # bottom growth (:1268-1305)
    Tmlts_b = -zSin[..., ni - 1] * c.DEPRESST
    qbot = -c.RHOI * (c.CP_ICE * (Tmlts_b - Tbot) +
                      c.LFRESH * (1.0 - Tmlts_b /
                                  jnp.minimum(Tbot, -c.PUNY)) -
                      c.CP_OCN * Tmlts_b)
    qbot = jnp.minimum(qbot, QBOTMAX)
    dhi = ebot_gro / qbot
    hqtot = dzi[ni - 1] * zqin_l[ni - 1] + dhi * qbot
    dzi[ni - 1] = dzi[ni - 1] + dhi
    zqin_l[ni - 1] = jnp.where(dzi[ni - 1] > c.PUNY,
                               hqtot / jnp.maximum(dzi[ni - 1], c.PUNY),
                               zqin_l[ni - 1])
    congel = dhi

    # snow: sublimation then top melt (:1322-1345)
    for k in range(ns):
        qsub = zqsn_l[k] - c.RHOS * c.LVAP
        dhs = jnp.maximum(-dzs[k], esub / qsub)
        dzs[k] = dzs[k] + dhs
        esub = jnp.maximum(esub - dhs * qsub, 0.0)
        evapn = evapn + dhs * c.RHOS
        dhs = jnp.maximum(-dzs[k],
                          etop_mlt / jnp.minimum(zqsn_l[k], -c.PUNY))
        dzs[k] = dzs[k] + dhs
        etop_mlt = jnp.maximum(etop_mlt - dhs * zqsn_l[k], 0.0)
        melts = melts - dhs

    # ice: sublimation then top melt, top-down (:1395-1425)
    for k in range(ni):
        qm = zqin_l[k]
        qsub = qm - c.RHOI * c.LVAP
        dhi = jnp.maximum(-dzi[k], esub / qsub)
        dzi[k] = dzi[k] + dhi
        esub = jnp.maximum(esub - dhi * qsub, 0.0)
        evapn = evapn + dhi * c.RHOI
        neg_q = qm < 0.0
        dhi = jnp.where(neg_q,
                        jnp.maximum(-dzi[k], etop_mlt /
                                    jnp.minimum(qm, -c.PUNY)),
                        -dzi[k])
        qm_eff = jnp.where(neg_q, qm, 0.0)
        dzi[k] = dzi[k] + dhi
        etop_mlt = jnp.maximum(etop_mlt - dhi * qm_eff, 0.0)
        meltt = meltt - dhi

    # ice: bottom melt, bottom-up (:1427-1440)
    for k in range(ni - 1, -1, -1):
        qm = zqin_l[k]
        neg_q = qm < 0.0
        dhi = jnp.where(neg_q,
                        jnp.maximum(-dzi[k], ebot_mlt /
                                    jnp.minimum(qm, -c.PUNY)),
                        -dzi[k])
        qm_eff = jnp.where(neg_q, qm, 0.0)
        dzi[k] = dzi[k] + dhi
        ebot_mlt = jnp.maximum(ebot_mlt - dhi * qm_eff, 0.0)
        meltb = meltb - dhi

    # snow: bottom melt after all ice gone (:1442-1452)
    for k in range(ns - 1, -1, -1):
        dhs = jnp.maximum(-dzs[k],
                          ebot_mlt / jnp.minimum(zqsn_l[k], -c.PUNY))
        dzs[k] = dzs[k] + dhs
        ebot_mlt = jnp.maximum(ebot_mlt - dhs * zqsn_l[k], 0.0)
        melts = melts - dhs

    fhocnn = fbot + (esub + etop_mlt + ebot_mlt) / dt

    # new snowfall (:1459-1480)
    hsn_new = fsnow / c.RHOS * dt
    hstot = dzs[0] + hsn_new
    zq_new = -c.RHOS * c.LFRESH
    zqsn_l[0] = jnp.where(
        hstot > 0.0,
        jnp.minimum((dzs[0] * zqsn_l[0] + hsn_new * zq_new) /
                    jnp.maximum(hstot, c.PUNY), -c.RHOS * c.LFRESH),
        zqsn_l[0])
    dzs[0] = jnp.where(hstot > 0.0, hstot, dzs[0])

    hin = sum(dzi)
    hsn = sum(dzs)

    # freeboard: convert snow to ice if below waterline (:1755-1900)
    wk1 = hsn - hin * (c.RHOW - c.RHOI) / c.RHOS
    below = (wk1 > c.PUNY) & (hsn > c.PUNY)
    dhsn_total = jnp.where(below, jnp.minimum(wk1 * c.RHOI / c.RHOW, hsn),
                           0.0)
    dhin = dhsn_total * c.RHOS / c.RHOI
    hqs = jnp.zeros_like(hin)
    dhsn = dhsn_total
    for k in range(ns - 1, -1, -1):
        act = dhin > c.PUNY
        dhs = jnp.where(act, jnp.minimum(dhsn, dzs[k]), 0.0)
        hsn = hsn - dhs
        dzs[k] = dzs[k] - dhs
        dhsn = jnp.maximum(dhsn - dhs, 0.0)
        hqs = hqs + dhs * zqsn_l[k]
    act = dhin > c.PUNY
    wk1 = dzi[0] + dhin
    hin = jnp.where(act, hin + dhin, hin)
    zqin_l[0] = jnp.where(
        act, (dzi[0] * zqin_l[0] + hqs) / jnp.maximum(wk1, c.PUNY),
        zqin_l[0])
    dzi[0] = jnp.where(act, wk1, dzi[0])
    snoice = jnp.where(act, dhin, 0.0)

    # re-grid to equal layers (:1520-1560)
    hin = jnp.maximum(hin, 0.0)
    hsn = jnp.maximum(hsn, 0.0)
    hilyr = hin / ni
    hslyr = hsn / ns
    dzi_a = jnp.stack([jnp.maximum(d, 0.0) for d in dzi], axis=-1)
    dzs_a = jnp.stack([jnp.maximum(d, 0.0) for d in dzs], axis=-1)
    zqin_a = jnp.stack(zqin_l, axis=-1)
    zqsn_a = jnp.stack(zqsn_l, axis=-1)
    zqin_a = adjust_enthalpy(dzi_a, hilyr, hin, zqin_a)
    if ns > 1:
        zqsn_a = adjust_enthalpy(dzs_a, hslyr, hsn, zqsn_a)

    efinal = -evapn * c.LVAP + \
        (hslyr[..., None] * zqsn_a).sum(-1) + \
        (hilyr[..., None] * zqin_a).sum(-1)
    evapn = evapn / dt

    return ThicknessResult(
        hin=hin, hsn=hsn, zqin=zqin_a, zqsn=zqsn_a, efinal=efinal,
        fhocnn=fhocnn, evapn=evapn, meltt=meltt, melts=melts,
        meltb=meltb, congel=congel, snoice=snoice,
        hsn_new=hsn_new)


class ThermoVerticalResult(NamedTuple):
    Tsf: jnp.ndarray
    hin: jnp.ndarray
    hsn: jnp.ndarray
    zqin: jnp.ndarray
    zqsn: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    fhocnn: jnp.ndarray
    freshn: jnp.ndarray
    fsaltn: jnp.ndarray
    evapn: jnp.ndarray
    meltt: jnp.ndarray
    melts: jnp.ndarray
    meltb: jnp.ndarray
    congel: jnp.ndarray
    snoice: jnp.ndarray
    converged: jnp.ndarray


def thermo_vertical(dt, aicen, vicen, vsnon, Tsf, zqin, zqsn, zSin,
                    flw, potT, Qa, rhoa, fsnow,
                    fbot, Tbot, fswsfc, fswint, Sswabs, Iswabs,
                    shcoef, lhcoef) -> ThermoVerticalResult:
    """Per-category vertical thermodynamics driver (reference
    thermo_vertical, ice_therm_vertical.F90:53-471).

    All inputs [*B] or [*B, nLayers]; category masking (aicen > puny)
    must be applied by the caller; columns with no ice still produce
    finite no-op results."""
    ni = zqin.shape[-1]
    ns = zqsn.shape[-1]
    has = aicen > c.PUNY
    safe_a = jnp.where(has, aicen, 1.0)
    hin = jnp.where(has, vicen / safe_a, 0.1)
    hsn = jnp.where(has, vsnon / safe_a, 0.0)
    hilyr = jnp.maximum(hin, c.PUNY) / ni
    hslyr = hsn / ns

    # initial temperatures from enthalpies (init_vertical_profile :652)
    Tmlt = -zSin * c.DEPRESST
    zTin = ice_temperature_from_enthalpy(zqin, Tmlt)
    l_snow = hslyr > c.HS_MIN / ns
    zTsn = jnp.where(l_snow[..., None],
                     jnp.minimum(snow_temperature_from_enthalpy(zqsn),
                                 0.0), 0.0)
    zqsn0 = jnp.where(l_snow[..., None], zqsn,
                      snow_enthalpy_from_temperature(0.0) *
                      jnp.ones_like(zqsn))
    einit = (hilyr[..., None] * zqin).sum(-1) + \
        (hslyr[..., None] * zqsn0).sum(-1)

    res = temperature_changes(
        dt, rhoa, flw, potT, Qa, shcoef, lhcoef,
        fswsfc, fswint, Sswabs, Iswabs,
        hilyr, hslyr, zqin, zTin, zqsn0, zTsn, zSin,
        Tsf, Tbot, einit)

    th = thickness_changes(
        dt, hilyr * ni, hslyr * ns, res.zqin, res.zqsn, zSin,
        fbot, Tbot, res.flatn, res.fsurfn, res.fcondtopn, res.fcondbot,
        fsnow)

    # freshwater and salt fluxes to the ocean (reference :380-430)
    dhi_melt = -(th.meltt + th.meltb) + th.congel
    freshn = jnp.where(
        has, aicen * (c.RHOS * (th.melts - th.hsn_new) -
                      c.RHOI * dhi_melt) / dt, 0.0)
    fsaltn = jnp.where(
        has, -aicen * c.RHOI * dhi_melt * c.ICE_REF_SALINITY * 1e-3 / dt,
        0.0)

    def m(x, extra=0):
        h = has.reshape(has.shape + (1,) * extra)
        return jnp.where(h, x, 0.0)

    return ThermoVerticalResult(
        Tsf=jnp.where(has, res.Tsf, Tsf),
        hin=m(th.hin), hsn=m(th.hsn),
        zqin=jnp.where(has[..., None], th.zqin, zqin),
        zqsn=jnp.where(has[..., None], th.zqsn, zqsn),
        fsensn=m(res.fsensn), flatn=m(res.flatn),
        flwoutn=m(res.flwoutn), fsurfn=m(res.fsurfn),
        fcondtopn=m(res.fcondtopn),
        fhocnn=m(th.fhocnn), freshn=freshn, fsaltn=fsaltn,
        evapn=m(th.evapn),
        meltt=m(th.meltt), melts=m(th.melts), meltb=m(th.meltb),
        congel=m(th.congel), snoice=m(th.snoice),
        converged=res.converged | ~has)
