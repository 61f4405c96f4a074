"""Atmosphere-ice boundary layer: stability-iterated turbulent transfer
coefficients (reference `ice_atmo.F90` atmo_boundary_layer; Monin-Obukhov
with the CCSM3 stability functions). The per-column iteration runs a
fixed `natmiter` count (reference default 5), vectorized over the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import constants as c

CP_WV = 1.81e3
CPVIR = CP_WV / c.CP_AIR - 1.0
ZTRF = 2.0          # reference height for temperature diagnostics (m)


def _psi_unstable(xqq):
    psimhu = jnp.log((1.0 + xqq * (2.0 + xqq)) * (1.0 + xqq * xqq) /
                     8.0) - 2.0 * jnp.arctan(xqq) + 0.5 * c.PI
    psixhu = 2.0 * jnp.log((1.0 + xqq * xqq) / 2.0)
    return psimhu, psixhu


class AtmoResult(NamedTuple):
    shcoef: jnp.ndarray
    lhcoef: jnp.ndarray
    strx: jnp.ndarray
    stry: jnp.ndarray
    Tref: jnp.ndarray
    Qref: jnp.ndarray
    delt: jnp.ndarray
    delq: jnp.ndarray


def atmo_boundary_layer(Tsf, potT, uatm, vatm, wind, zlvl, Qa, rhoa,
                        natmiter: int = 5,
                        sfctype: str = "ice") -> AtmoResult:
    """Transfer coefficients for sensible/latent heat + wind stress
    (reference atmo_boundary_layer, ice_atmo.F90). All inputs [*B]."""
    if sfctype == "ice":
        qqq, TTT, Lheat = c.QQQICE, c.TTTICE, c.LSUB
        vmag = jnp.maximum(1.0, wind)
        rdn = c.VONKAR / jnp.log(c.ZREF / c.ICERUF)
        rdn = jnp.full_like(wind, rdn)
    else:
        qqq, TTT, Lheat = c.QQQOCN, c.TTTOCN, c.LVAP
        vmag = jnp.maximum(1.0, wind)
        rdn = jnp.sqrt(0.0027 / vmag + 0.000142 + 0.0000764 * vmag)

    TsfK = Tsf + c.TFFRESH
    qsat = qqq * jnp.exp(-TTT / TsfK)
    ssq = qsat / rhoa
    thva = potT * (1.0 + c.ZVIR * Qa)
    delt = potT - TsfK
    delq = Qa - ssq
    alz = jnp.log(zlvl / c.ZREF)
    cp = c.CP_AIR * (1.0 + CPVIR * ssq)
    al2 = jnp.log(c.ZREF / ZTRF)

    rhn = rdn
    ren = rdn
    ustar = rdn * vmag
    tstar = rhn * delt
    qstar = ren * delq

    rd = rdn
    rh = rhn
    re = ren
    psixh = jnp.zeros_like(vmag)
    stable = jnp.zeros_like(vmag)
    hol = jnp.zeros_like(vmag)
    for _ in range(natmiter):
        hol = c.VONKAR * c.GRAVIT * zlvl * (
            tstar / thva + qstar / (1.0 / c.ZVIR + Qa)) / \
            jnp.maximum(ustar ** 2, c.PUNY)
        hol = jnp.sign(hol) * jnp.minimum(jnp.abs(hol), 10.0)
        stable = 0.5 + 0.5 * jnp.sign(hol)
        xqq = jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * hol)), 1.0)
        xqq = jnp.sqrt(xqq)
        psimhs = -(0.7 * hol + 0.75 * (hol - 14.3) *
                   jnp.exp(-0.35 * hol) + 10.7)
        psimhu, psixhu = _psi_unstable(xqq)
        psimh = psimhs * stable + (1.0 - stable) * psimhu
        psixh = psimhs * stable + (1.0 - stable) * psixhu
        rd = rdn / (1.0 + rdn / c.VONKAR * (alz - psimh))
        rh = rhn / (1.0 + rhn / c.VONKAR * (alz - psixh))
        re = ren / (1.0 + ren / c.VONKAR * (alz - psixh))
        ustar = rd * vmag
        tstar = rh * delt
        qstar = re * delq

    tau = rhoa * ustar * rd
    strx = tau * uatm
    stry = tau * vatm

    shcoef = rhoa * ustar * cp * rh + 1.0
    lhcoef = rhoa * ustar * Lheat * re

    # 2-m diagnostics (reference :declarations for Tref/Qref)
    hol2 = hol * ZTRF / zlvl
    xqq = jnp.maximum(1.0, jnp.sqrt(jnp.abs(1.0 - 16.0 * hol2)))
    xqq = jnp.sqrt(xqq)
    _, psixhu2 = _psi_unstable(xqq)
    psix2 = -5.0 * hol2 * stable + (1.0 - stable) * psixhu2
    fac = (rh / c.VONKAR) * (alz + al2 - psixh + psix2)
    Tref = potT - delt * fac - 0.01 * ZTRF
    fac = (re / c.VONKAR) * (alz + al2 - psixh + psix2)
    Qref = Qa - delq * fac

    return AtmoResult(shcoef=shcoef, lhcoef=lhcoef, strx=strx,
                      stry=stry, Tref=Tref, Qref=Qref,
                      delt=delt, delq=delq)


def atmo_constant_coefficients(Tsf, potT, uatm, vatm, wind, Qa, rhoa):
    """Constant-coefficient fallback (reference atmo_boundary_const):
    shcoef/lhcoef with fixed exchange coefficient 1.2e-3."""
    vmag = jnp.maximum(1.0, wind)
    tau = rhoa * 0.0012 * vmag
    strx = tau * uatm
    stry = tau * vatm
    shcoef = tau * c.CP_AIR
    lhcoef = tau * c.LSUB
    TsfK = Tsf + c.TFFRESH
    return AtmoResult(
        shcoef=shcoef, lhcoef=lhcoef, strx=strx, stry=stry,
        Tref=potT, Qref=Qa, delt=potT - TsfK,
        delq=Qa - c.QQQICE * jnp.exp(-c.TTTICE / TsfK) / rhoa)
