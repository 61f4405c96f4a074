"""Bitz & Lipscomb (1999) vertical heat solver, vectorized.

TPU-native re-design of `temperature_changes`
(`/root/reference/src/column/ice_therm_bl99.F90:53-811`): the per-column
Newton-ish iteration with tridiagonal solves becomes a batched
`lax.while_loop` over all (cell, category) columns at once, with
per-column convergence masking (converged columns freeze their values).
The tridiagonal system (nslyr + nilyr + 1 unknowns) is solved by an
unrolled Thomas algorithm — layer counts are static, so XLA fully
vectorizes across the batch.

Batch convention: every field has an arbitrary leading batch shape B
(typically [nCells, nCategories]); layer fields are [*B, nLayers].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c
from .thermo_shared import (dsurface_heat_flux_dTsf,
                            ice_enthalpy_from_temperature,
                            snow_enthalpy_from_temperature,
                            surface_heat_flux)

NITERMAX = 100
TSF_ERRMAX = 5.0e-4


def _build_kh(l_snow, hilyr, hslyr, zTin, zSin, ns, conduct="bl99"):
    """kh [*B, ns+ni+1]: index 0 = snow top, 1..ns-1 = snow interior,
    ns = snow/ice interface (or ice top), ns+1..ns+ni-1 = ice interior,
    ns+ni = ice bottom."""
    ni = zTin.shape[-1]
    if conduct == "mu71":
        kilyr = c.KICE + c.BETAK * zSin / jnp.minimum(-c.PUNY, zTin)
    else:
        kilyr = (2.11 - 0.011 * zTin +
                 0.09 * zSin / jnp.minimum(-c.PUNY, zTin)) * \
            c.RHOI / 917.0
    kilyr = jnp.maximum(kilyr, c.KIMIN)

    hs = jnp.maximum(hslyr, c.PUNY)
    hi = jnp.maximum(hilyr, c.PUNY)
    rows = []
    # snow top
    rows.append(jnp.where(l_snow, 2.0 * c.KSNO / hs, 0.0))
    # snow interior
    for k in range(1, ns):
        rows.append(jnp.where(l_snow, c.KSNO / hs, 0.0))
    # snow/ice interface (or bare-ice top)
    k_int = 2.0 * c.KSNO * kilyr[..., 0] / (
        c.KSNO * hi + kilyr[..., 0] * hs)
    rows.append(jnp.where(l_snow, k_int, 2.0 * kilyr[..., 0] / hi))
    # ice interior
    for k in range(1, ni):
        rows.append(2.0 * kilyr[..., k - 1] * kilyr[..., k] /
                    ((kilyr[..., k - 1] + kilyr[..., k]) * hi))
    # ice bottom
    rows.append(2.0 * kilyr[..., ni - 1] / hi)
    return jnp.stack(rows, axis=-1)


def _tridiag(sb, d, sp, rhs):
    """Batched Thomas algorithm; all [*B, n], unrolled over n."""
    n = d.shape[-1]
    wbeta = d[..., 0]
    x = [rhs[..., 0] / wbeta]
    gamma = []
    for k in range(1, n):
        g = sp[..., k - 1] / wbeta
        gamma.append(g)
        wbeta = d[..., k] - sb[..., k] * g
        x.append((rhs[..., k] - sb[..., k] * x[k - 1]) / wbeta)
    for k in range(n - 2, -1, -1):
        x[k] = x[k] - gamma[k] * x[k + 1]
    return jnp.stack(x, axis=-1)


class ThermoSolveResult(NamedTuple):
    Tsf: jnp.ndarray
    zTsn: jnp.ndarray
    zTin: jnp.ndarray
    zqsn: jnp.ndarray
    zqin: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    fcondbot: jnp.ndarray
    fswsfc: jnp.ndarray
    fswint: jnp.ndarray
    Sswabs: jnp.ndarray
    Iswabs: jnp.ndarray
    converged: jnp.ndarray


def temperature_changes(dt, rhoa, flw, potT, Qa, shcoef, lhcoef,
                        fswsfc, fswint, Sswabs, Iswabs,
                        hilyr, hslyr, zqin, zTin, zqsn, zTsn, zSin,
                        Tsf, Tbot, einit,
                        conduct: str = "bl99",
                        calc_tsfc: bool = True,
                        fsurfn_f=None, fcondtopn_f=None,
                        flatn_f=None, fsensn_f=None) -> ThermoSolveResult:
    """Solve for new temperatures/enthalpies in all columns at once.

    Shapes: scalars/fluxes [*B]; zq*/zT*/zS* [*B, nLayers];
    all float.

    calc_tsfc=False is the coupled prescribed-surface-flux mode
    (reference `get_matrix_elements_know_Tsfc`,
    ice_therm_bl99.F90:1242-1447 + the `.not. calc_Tsfc` branches of
    `temperature_changes` :377-684): the surface temperature row drops
    out of the tridiagonal system, the prescribed downward conductive
    flux `fcondtopn_f` enters the top snow (or bare-ice) layer rhs
    directly, Tsf stays at its coupler-provided value, and convergence
    replaces the Tsf conditions (1,3,4) with the oscillating-zTin(1)
    check (condition 2b, :618-631).  fsurfn_f/flatn_f/fsensn_f are the
    coupler's turbulent/radiative fluxes (set_sfcflux,
    ice_flux_colpkg.F90:174-288) and flow through unchanged."""
    if not calc_tsfc and fcondtopn_f is None:
        raise ValueError("calc_tsfc=False requires prescribed "
                         "fcondtopn_f/fsurfn_f/flatn_f/fsensn_f")
    ns = zTsn.shape[-1]
    ni = zTin.shape[-1]
    dtype = Tsf.dtype

    l_snow = hslyr > c.HS_MIN / ns
    dt_rhoi_hlyr = dt / (c.RHOI * jnp.maximum(hilyr, c.PUNY))
    Tmlts = -zSin * c.DEPRESST
    Tin_init = zTin
    Tsn_init = zTsn
    etas_base = jnp.where(
        l_snow, dt / (c.RHOS * c.CP_ICE * jnp.maximum(hslyr, c.PUNY)),
        0.0)

    kh = _build_kh(l_snow, hilyr, hslyr, zTin, zSin, ns, conduct)

    # -- cap excessive absorbed shortwave (reference :537-594) --
    frac, dTemp = 0.9, 0.02
    Isw_new = []
    for k in range(ni):
        ci = c.CP_ICE - c.LFRESH * Tmlts[..., k] / (Tin_init[..., k] ** 2)
        cap = frac * (Tmlts[..., k] - Tin_init[..., k]) * ci / dt_rhoi_hlyr
        Isw_tmp = jnp.where(Tin_init[..., k] <= Tmlts[..., k] - dTemp,
                            jnp.minimum(Iswabs[..., k], cap), 0.0)
        Isw_tmp = jnp.where(Isw_tmp < c.PUNY, 0.0, Isw_tmp)
        dswabs = jnp.minimum(Iswabs[..., k] - Isw_tmp, fswint)
        fswsfc = fswsfc + dswabs
        fswint = fswint - dswabs
        Isw_new.append(Isw_tmp)
    Iswabs = jnp.stack(Isw_new, axis=-1)
    Ssw_new = []
    for k in range(ns):
        cap = -frac * Tsn_init[..., k] / jnp.maximum(etas_base, c.PUNY)
        Ssw_tmp = jnp.where(l_snow & (Tsn_init[..., k] <= -dTemp),
                            jnp.minimum(Sswabs[..., k], cap), 0.0)
        Ssw_tmp = jnp.where(Ssw_tmp < c.PUNY, 0.0, Ssw_tmp)
        dswabs = jnp.where(l_snow,
                           jnp.minimum(Sswabs[..., k] - Ssw_tmp, fswint),
                           0.0)
        fswsfc = fswsfc + dswabs
        fswint = fswint - dswabs
        Ssw_new.append(jnp.where(l_snow, Ssw_tmp, Sswabs[..., k]))
    Sswabs = jnp.stack(Ssw_new, axis=-1)

    zeros = jnp.zeros_like(Tsf)

    def one_iteration(carry):
        (Tsf, zTsn, zTin, Tsn_start, Tin_start_i, kh, dTsf_prev,
         fsurfn_p, fcondtopn_p, fcondbot_p, zqsn_p, zqin_p,
         flw_p, fsens_p, flat_p, energy_ok_p, converged,
         niter) = carry

        # specific heat from current + initial temps (energy-conserving)
        ci = c.CP_ICE - c.LFRESH * Tmlts / (
            jnp.minimum(zTin, -c.PUNY) * jnp.minimum(Tin_init, -c.PUNY))
        etai = dt_rhoi_hlyr[..., None] / ci       # [*B, ni]
        etas = etas_base

        if calc_tsfc:
            flwoutn, fsensn, flatn, fsurfn = surface_heat_flux(
                Tsf, fswsfc, rhoa, flw, potT, Qa, shcoef, lhcoef)
            _, _, _, dfsurf_dT = dsurface_heat_flux_dTsf(
                Tsf, rhoa, shcoef, lhcoef)

            fcondtop0 = jnp.where(l_snow,
                                  kh[..., 0] * (Tsf - zTsn[..., 0]),
                                  kh[..., ns] * (Tsf - zTin[..., 0]))
            Tsf = jnp.where((Tsf >= 0.0) & (fsurfn < fcondtop0),
                            -c.PUNY, Tsf)
        else:
            # prescribed coupler fluxes; nothing depends on Tsf
            flwoutn = zeros
            fsensn = fsensn_f
            flatn = flatn_f
            fsurfn = fsurfn_f
            dfsurf_dT = zeros
        Tsf_start = Tsf
        l_cold = Tsf < 0.0

        # -- assemble tridiagonal matrix (reference :994-1447) --
        nmat = ns + ni + 1
        SB = [zeros] * nmat
        D = [jnp.ones_like(Tsf)] * nmat
        SP = [zeros] * nmat
        R = [zeros] * nmat

        # Tsf equation occupies row 0 (snow) or row ns (no snow)
        tsf_diag = dfsurf_dT - jnp.where(l_snow, kh[..., 0], kh[..., ns])
        tsf_sp = jnp.where(l_snow, kh[..., 0], kh[..., ns])
        tsf_rhs = dfsurf_dT * Tsf - fsurfn

        row0_is_tsf = l_snow & l_cold & calc_tsfc
        SB[0] = zeros
        D[0] = jnp.where(row0_is_tsf, tsf_diag, 1.0)
        SP[0] = jnp.where(row0_is_tsf, tsf_sp, 0.0)
        R[0] = jnp.where(row0_is_tsf, tsf_rhs, 0.0)

        # snow layer rows 1..ns
        for k in range(ns):
            r = k + 1
            kh_up = kh[..., k]
            kh_dn = kh[..., k + 1]
            diag_s = 1.0 + etas * (kh_up + kh_dn)
            if k == 0 and calc_tsfc:
                sb_cold = -etas * kh_up
                rhs_cold = Tsn_init[..., 0] + etas * Sswabs[..., 0]
                rhs_warm = Tsn_init[..., 0] + etas * kh_up * Tsf + \
                    etas * Sswabs[..., 0]
                sb = jnp.where(l_cold, sb_cold, 0.0)
                rhs = jnp.where(l_cold, rhs_cold, rhs_warm)
            elif k == 0:
                # know_Tsfc: the prescribed conductive flux is the top
                # boundary condition; no coupling through kh[0]
                # (reference get_matrix_elements_know_Tsfc :1322-1330)
                sb = zeros
                diag_s = 1.0 + etas * kh_dn
                rhs = Tsn_init[..., 0] + etas * Sswabs[..., 0] + \
                    etas * fcondtopn_f
            else:
                sb = -etas * kh_up
                rhs = Tsn_init[..., k] + etas * Sswabs[..., k]
            SB[r] = jnp.where(l_snow, sb, 0.0)
            D[r] = jnp.where(l_snow, diag_s, 1.0)
            SP[r] = jnp.where(l_snow, -etas * kh_dn, 0.0)
            R[r] = jnp.where(l_snow, rhs, 0.0)

        # row ns doubles as the Tsf equation when there is no snow
        rowns_is_tsf = (~l_snow) & l_cold & calc_tsfc
        SB[ns] = jnp.where(rowns_is_tsf, 0.0, SB[ns])
        D[ns] = jnp.where(rowns_is_tsf, tsf_diag, D[ns])
        SP[ns] = jnp.where(rowns_is_tsf, tsf_sp, SP[ns])
        R[ns] = jnp.where(rowns_is_tsf, tsf_rhs, R[ns])

        # ice layer rows ns+1 .. ns+ni
        for k in range(ni):
            r = ns + 1 + k
            kh_up = kh[..., ns + k]
            kh_dn = kh[..., ns + k + 1]
            et = etai[..., k]
            diag_i = 1.0 + et * (kh_up + kh_dn)
            rhs = Tin_init[..., k] + et * Iswabs[..., k]
            sb = -et * kh_up
            sp = -et * kh_dn
            if k == 0 and calc_tsfc:
                # bare warm ice: Tsf is known (0), enters the rhs
                warm_bare = (~l_snow) & (~l_cold)
                sb = jnp.where(warm_bare, 0.0, sb)
                rhs = jnp.where(warm_bare, rhs + et * kh_up * Tsf, rhs)
            elif k == 0:
                # know_Tsfc bare ice: prescribed flux enters the top
                # ice layer directly (reference :1360-1374)
                bare = ~l_snow
                sb = jnp.where(bare, 0.0, sb)
                diag_i = jnp.where(bare, 1.0 + et * kh_dn, diag_i)
                rhs = jnp.where(bare, rhs + et * fcondtopn_f, rhs)
            if k == ni - 1:
                sp = zeros
                rhs = rhs + et * kh_dn * Tbot
            SB[r], D[r], SP[r], R[r] = sb, diag_i, sp, rhs

        Tmat = _tridiag(jnp.stack(SB, -1), jnp.stack(D, -1),
                        jnp.stack(SP, -1), jnp.stack(R, -1))

        # -- convergence bookkeeping (reference :455-700) --
        conv = jnp.ones_like(converged)
        avg_Tsf = zeros
        avg_Tsi = zeros
        if calc_tsfc:
            Tsf_new = jnp.where(
                l_cold, jnp.where(l_snow, Tmat[..., 0], Tmat[..., ns]),
                0.0)
            dTsf = Tsf_new - Tsf_start

            cond1 = Tsf_new > c.PUNY
            Tsf_new = jnp.where(cond1, 0.0, Tsf_new)
            dTsf = jnp.where(cond1, -Tsf_start, dTsf)
            avg_Tsi = jnp.where(cond1, 1.0, avg_Tsi)
            conv = conv & ~cond1

            cond2 = ((niter > 1) & (Tsf_start <= -c.PUNY) &
                     (jnp.abs(dTsf) > c.PUNY) &
                     (jnp.abs(dTsf_prev) > c.PUNY) &
                     (-dTsf / (dTsf_prev + c.PUNY * c.PUNY) > 0.5))
            avg_Tsf = jnp.where(cond2, 1.0, avg_Tsf)
            avg_Tsi = jnp.where(cond2, 1.0, avg_Tsi)
            dTsf = jnp.where(cond2, 0.5 * dTsf, dTsf)
            conv = conv & ~cond2

            Tsf_new = Tsf_new + avg_Tsf * 0.5 * (Tsf_start - Tsf_new)
        else:
            # Tsf is the coupler's; it never moves
            Tsf_new = Tsf
            dTsf = zeros

        # snow temps / enthalpies
        zTsn_new = jnp.where(l_snow[..., None],
                             Tmat[..., 1:ns + 1], 0.0)
        zTsn_new = jnp.minimum(zTsn_new, 0.0)
        zTsn_new = zTsn_new + avg_Tsi[..., None] * 0.5 * \
            (Tsn_start - zTsn_new)
        zqsn_new = snow_enthalpy_from_temperature(zTsn_new)
        enew = (hslyr[..., None] * zqsn_new).sum(axis=-1)

        # ice temps, melting-point capping, enthalpies
        zTin_m = Tmat[..., ns + 1:]
        over = zTin_m > Tmlts - c.PUNY
        dTmat = jnp.where(over, zTin_m - Tmlts, 0.0)
        dqmat = jnp.where(
            over,
            c.RHOI * dTmat * (c.CP_ICE - c.LFRESH * Tmlts /
                              jnp.minimum(zTin_m, -c.PUNY) ** 2), 0.0)
        zTin_new = jnp.where(over, Tmlts, zTin_m)
        if not calc_tsfc:
            # condition 2b (reference :618-631): oscillating zTin(1);
            # the dTsf_prev carry slot holds dTi1_prev in this mode
            dTi1 = zTin_new[..., 0] - Tin_start_i[..., 0]
            cond2b = ((niter > 1) & (jnp.abs(dTi1) > c.PUNY) &
                      (jnp.abs(dTsf_prev) > c.PUNY) &
                      (-dTi1 / (dTsf_prev + c.PUNY * c.PUNY) > 0.5))
            avg_Tsi = jnp.where(cond2b, 1.0, avg_Tsi)
            dTi1 = jnp.where(cond2b, 0.5 * dTi1, dTi1)
            conv = conv & ~cond2b
            dTsf = dTi1    # carried as dTsf_prev for the next iterate
        zTin_new = zTin_new + avg_Tsi[..., None] * 0.5 * \
            (Tin_start_i - zTin_new)
        zqin_new = ice_enthalpy_from_temperature(zTin_new, Tmlts)
        enew = enew + (hilyr[..., None] * zqin_new).sum(axis=-1)
        einex = (hilyr[..., None] * dqmat).sum(axis=-1)

        if calc_tsfc:
            cond3 = jnp.abs(dTsf) > TSF_ERRMAX
            conv = conv & ~cond3

            fsurfn = fsurfn + dTsf * dfsurf_dT
            fcondtopn = jnp.where(
                l_snow, kh[..., 0] * (Tsf_new - zTsn_new[..., 0]),
                kh[..., ns] * (Tsf_new - zTin_new[..., 0]))
            cond4 = (Tsf_new >= 0.0) & (fsurfn < fcondtopn)
            conv = conv & ~cond4
        else:
            fcondtopn = fcondtopn_f

        fcondbot = kh[..., ns + ni] * (zTin_new[..., ni - 1] - Tbot) + \
            einex / dt
        ferr = jnp.abs((enew - einit) / dt -
                       (fcondtopn - fcondbot + fswint))
        # dtype-aware tolerance: enew/einit are ~1e8 J/m^2 column
        # enthalpies, so the f32 cancellation noise floor of
        # (enew-einit)/dt exceeds the reference's absolute FERRMAX
        # (1e-3 W/m^2) for thick cold columns and convergence becomes
        # unattainable; in f64 the dynamic term is ~1e-11 W/m^2 and
        # the reference tolerance is unchanged (bitwise no-op)
        eps = jnp.finfo(enew.dtype).eps
        ferr_tol = jnp.maximum(
            0.9 * c.FERRMAX,
            4.0 * eps * jnp.maximum(jnp.abs(enew),
                                    jnp.abs(einit)) / dt)
        cond5 = ferr > ferr_tol
        conv = conv & ~cond5

        # reduce conductivity where the matrix overshot the melting point
        denom = jnp.maximum(jnp.abs(fcondtopn - fcondbot), c.PUNY)
        frac_kh = jnp.maximum(0.5 * (1.0 - ferr / denom), 0.1)
        kh_new = kh
        for k in range(ni):
            red = cond5 & over[..., k] & (dqmat[..., k] > 0.0)
            khb = jnp.where(red, kh[..., ns + k + 1] * frac_kh,
                            kh[..., ns + k + 1])
            kh_new = kh_new.at[..., ns + k + 1].set(khb)
            kh_new = kh_new.at[..., ns + k].set(
                jnp.where(red, khb, kh_new[..., ns + k]))

        # freeze already-converged columns
        def sel(new, old):
            cexp = converged.reshape(converged.shape + (1,) *
                                     (new.ndim - converged.ndim))
            return jnp.where(cexp, old, new)

        return (sel(Tsf_new, Tsf), sel(zTsn_new, zTsn),
                sel(zTin_new, zTin), sel(zTsn_new, Tsn_start),
                sel(zTin_new, Tin_start_i), sel(kh_new, kh),
                sel(dTsf, dTsf_prev),
                sel(fsurfn, fsurfn_p), sel(fcondtopn, fcondtopn_p),
                sel(fcondbot, fcondbot_p),
                sel(zqsn_new, zqsn_p), sel(zqin_new, zqin_p),
                sel(flwoutn, flw_p), sel(fsensn, fsens_p),
                sel(flatn, flat_p),
                sel(~cond5, energy_ok_p),
                converged | conv, niter + 1)

    def cond_fn(carry):
        converged = carry[-2]
        niter = carry[-1]
        return (~jnp.all(converged)) & (niter <= NITERMAX)

    init = (Tsf, zTsn, zTin, Tsn_init, Tin_init, kh,
            zeros, zeros, zeros, zeros,
            jnp.zeros_like(zqsn), jnp.zeros_like(zqin),
            zeros, zeros, zeros,
            jnp.zeros(Tsf.shape, bool),
            jnp.zeros(Tsf.shape, bool), jnp.array(1))
    out = jax.lax.while_loop(cond_fn, lambda s: one_iteration(s), init)
    (Tsf_f, zTsn_f, zTin_f, _, _, _, _, fsurf_f, fct_f, fcb_f,
     zqsn_f, zqin_f, flwout_f, fsens_f, flat_f, eok_f, conv_f,
     _) = out
    if dtype == jnp.float32:
        # f32 acceptance at NITERMAX: the Tsf-oscillation conditions
        # (2, 3, 4) can chatter around TSF_ERRMAX=5e-4 K at the f32
        # tridiagonal noise floor; a column whose ENERGY closure
        # (condition 5) holds at the final iterate is physically
        # converged.  Exact no-op in f64 (the only precision the
        # reference runs).
        conv_f = conv_f | eok_f

    return ThermoSolveResult(
        Tsf=Tsf_f, zTsn=zTsn_f, zTin=zTin_f, zqsn=zqsn_f, zqin=zqin_f,
        fsensn=fsens_f, flatn=flat_f, flwoutn=flwout_f, fsurfn=fsurf_f,
        fcondtopn=fct_f, fcondbot=fcb_f,
        fswsfc=fswsfc, fswint=fswint, Sswabs=Sswabs, Iswabs=Iswabs,
        converged=conv_f)
