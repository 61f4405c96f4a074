"""Mushy-layer vertical heat solver (ktherm=2): batched Picard iteration.

TPU-native re-design of the reference mushy temperature solve
(`ice_therm_mushy.F90`: picard_solver :1128-1406 with
solve_heat_conduction :2110 and the matrix_elements_* family
:2345-2851): at each Picard iteration the liquid fraction phi is frozen,
a tridiagonal system for the new temperatures is solved (effective heat
capacity phi*(cw-ci)+ci, latent heat in the right-hand side), then phi
is refreshed from the mushy liquidus — batched over all columns with
per-column convergence masking, like the BL99 solver.

This round implements the q = w = 0 (no gravity drainage / flushing)
configuration: bulk salinity is held fixed over the step. The drainage
fluxes (picard_drainage/flushing_fluxes, solve_salinity) are round-2
work (NOTES.md).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as c
from .bl99 import _tridiag
from .mushy import (conductivity_mush, enthalpy_mush, liquid_fraction,
                    temperature_mush)
from .thermo_shared import (dsurface_heat_flux_dTsf,
                            snow_enthalpy_from_temperature,
                            snow_temperature_from_enthalpy,
                            surface_heat_flux)

NITERMAX = 100
DT_ERRMAX = 5.0e-4
_CW = c.CP_OCN * c.RHOW
_CI = c.CP_ICE * c.RHOI
_LI = c.LFRESH * c.RHOI


class MushySolveResult(NamedTuple):
    Tsf: jnp.ndarray
    zTsn: jnp.ndarray
    zTin: jnp.ndarray
    zqsn: jnp.ndarray
    zqin: jnp.ndarray
    phi: jnp.ndarray
    fsensn: jnp.ndarray
    flatn: jnp.ndarray
    flwoutn: jnp.ndarray
    fsurfn: jnp.ndarray
    fcondtopn: jnp.ndarray
    fcondbot: jnp.ndarray
    converged: jnp.ndarray


def _intercell(hilyr, hslyr, km, ks, l_snow, ns, ni):
    """Grid-point distances dxp and interface conductivities kcstar
    (reference calc_intercell_thickness/_conductivity). All [*B, ...]."""
    rows = []
    krow = []
    # snow-present layout
    dxp_s = [hslyr / 2.0] + [hslyr] * (ns - 1) + \
        [(hilyr + hslyr) / 2.0] + [hilyr] * (ni - 1) + [hilyr / 2.0]
    kc_s = [ks[..., 0]]
    for k in range(1, ns):
        kc_s.append(2.0 * ks[..., k] * ks[..., k - 1] /
                    (ks[..., k] + ks[..., k - 1]))
    fe = hilyr / jnp.maximum(hilyr + hslyr, c.PUNY)
    kc_s.append(1.0 / ((1.0 - fe) / jnp.maximum(ks[..., ns - 1], c.PUNY)
                       + fe / jnp.maximum(km[..., 0], c.PUNY)))
    for k in range(1, ni):
        kc_s.append(2.0 * km[..., k] * km[..., k - 1] /
                    (km[..., k] + km[..., k - 1]))
    kc_s.append(km[..., ni - 1])
    # no-snow layout: shift ice to the front, zero-pad the tail
    dxp_n = [hilyr / 2.0] + [hilyr] * (ni - 1) + [hilyr / 2.0] + \
        [jnp.zeros_like(hilyr)] * ns
    kc_n = [km[..., 0]]
    for k in range(1, ni):
        kc_n.append(2.0 * km[..., k] * km[..., k - 1] /
                    (km[..., k] + km[..., k - 1]))
    kc_n.append(km[..., ni - 1])
    kc_n += [jnp.zeros_like(hilyr)] * ns

    ls = l_snow
    for i in range(ns + ni + 1):
        rows.append(jnp.where(ls, dxp_s[i], dxp_n[i]))
        krow.append(jnp.where(ls, kc_s[i], kc_n[i]))
    return jnp.stack(rows, -1), jnp.stack(krow, -1)


def temperature_changes_mushy(dt, rhoa, flw, potT, Qa, shcoef, lhcoef,
                              fswsfc, fswint, Sswabs, Iswabs,
                              hilyr, hslyr, zqin, zSin, zqsn,
                              Tsf, Tbot) -> MushySolveResult:
    """Solve the mushy heat equation in all columns at once.

    Shapes as in bl99.temperature_changes; zSin is held fixed (q=w=0)."""
    ns = zqsn.shape[-1]
    ni = zqin.shape[-1]

    l_snow = hslyr > c.HS_MIN / ns
    zTin = temperature_mush(zqin, zSin)
    phi = liquid_fraction(zTin, zSin)
    zTsn = jnp.where(l_snow[..., None],
                     jnp.minimum(snow_temperature_from_enthalpy(zqsn),
                                 0.0), 0.0)
    zqsn0 = jnp.where(l_snow[..., None], zqsn,
                      snow_enthalpy_from_temperature(0.0) *
                      jnp.ones_like(zqsn))
    km = conductivity_mush(zqin, zSin)
    ks = jnp.full_like(zqsn, c.KSNO)
    dxp, kc = _intercell(jnp.maximum(hilyr, c.PUNY), hslyr, km, ks,
                         l_snow, ns, ni)

    zqin0 = zqin
    hil = jnp.maximum(hilyr, c.PUNY)
    hsl = hslyr
    einit = (hil[..., None] * zqin).sum(-1) + \
        jnp.where(l_snow, (hsl[..., None] * zqsn0).sum(-1), 0.0)
    zeros = jnp.zeros_like(Tsf)

    def one_iteration(carry):
        # *_pp are the k-2 iterates (for the oscillation detector); the
        # unsuffixed values are the k-1 iterates
        (Tsf, zTsn, zTin, phi, Tsf_pp, zTsn_pp, zTin_pp,
         fsurf_p, fct_p, fcb_p, flw_p, fsn_p, flt_p,
         converged, niter) = carry

        flwoutn, fsensn, flatn, fsurfn = surface_heat_flux(
            Tsf, fswsfc, rhoa, flw, potT, Qa, shcoef, lhcoef)
        _, _, _, dfsurf_dT = dsurface_heat_flux_dTsf(
            Tsf, rhoa, shcoef, lhcoef)
        l_cold = Tsf < 0.0

        # assemble the fixed-size tridiagonal (reference
        # matrix_elements_*): row 0 = Tsf (snow), rows 1..ns snow,
        # row ns doubles as Tsf for bare ice, rows ns+1..ns+ni ice.
        nmat = ns + ni + 1
        SB = [zeros] * nmat
        D = [jnp.ones_like(Tsf)] * nmat
        SP = [zeros] * nmat
        R = [zeros] * nmat

        tsf_diag = dfsurf_dT - jnp.where(l_snow, kc[..., 0] /
                                         dxp[..., 0],
                                         kc[..., 0] / dxp[..., 0])
        tsf_sp = jnp.where(l_snow, kc[..., 0] / dxp[..., 0],
                           kc[..., 0] / dxp[..., 0])
        tsf_rhs = dfsurf_dT * Tsf - fsurfn

        row0_is_tsf = l_snow & l_cold
        D[0] = jnp.where(row0_is_tsf, tsf_diag, 1.0)
        SP[0] = jnp.where(row0_is_tsf, tsf_sp, 0.0)
        R[0] = jnp.where(row0_is_tsf, tsf_rhs, 0.0)

        # snow rows (heat capacity rhos*cp_ice; reference
        # matrix_elements_snow_*)
        rcs = c.RHOS * c.CP_ICE
        for k in range(ns):
            r = k + 1
            kup = kc[..., k] / dxp[..., k]
            kdn = kc[..., k + 1] / dxp[..., k + 1]
            diag = (rcs / dt) * hsl + kup + kdn
            # rhos*ci*T_old = q_s0 + rhos*Lfresh (snow enthalpy relation)
            rhs = ((zqsn0[..., k] + c.RHOS * c.LFRESH) / dt) * hsl + \
                Sswabs[..., k]
            sb = -kup
            if k == 0:
                # melting surface: Tsf = 0 contributes nothing to rhs
                sb = jnp.where(l_cold, -kup, 0.0)
            SB[r] = jnp.where(l_snow, sb, 0.0)
            D[r] = jnp.where(l_snow, diag, 1.0)
            SP[r] = jnp.where(l_snow, -kdn, 0.0)
            R[r] = jnp.where(l_snow, rhs, 0.0)

        rowns_is_tsf = (~l_snow) & l_cold
        D[ns] = jnp.where(rowns_is_tsf, tsf_diag, D[ns])
        SP[ns] = jnp.where(rowns_is_tsf, tsf_sp, SP[ns])
        R[ns] = jnp.where(rowns_is_tsf, tsf_rhs, R[ns])
        SB[ns] = jnp.where(rowns_is_tsf, 0.0, SB[ns])

        # ice rows: interface index in the snow layout is k+ns; in the
        # bare layout it is k. Select per column.
        for k in range(ni):
            r = ns + 1 + k
            i_s = k + ns          # snow-present interface index
            i_n = k               # bare-ice interface index
            kup = jnp.where(l_snow, kc[..., i_s] / dxp[..., i_s],
                            kc[..., i_n] / jnp.maximum(dxp[..., i_n],
                                                       c.PUNY))
            kdn = jnp.where(l_snow,
                            kc[..., i_s + 1] / dxp[..., i_s + 1],
                            kc[..., i_n + 1] /
                            jnp.maximum(dxp[..., i_n + 1], c.PUNY))
            ceff = (phi[..., k] * (_CW - _CI) + _CI) / dt * hil
            diag = ceff + kup + kdn
            rhs = (((1.0 - phi[..., k]) * _LI + zqin0[..., k]) / dt) * \
                hil + Iswabs[..., k]
            sb = -kup
            sp = -kdn
            if k == 0:
                # bare melting surface: Tsf = 0 enters the rhs
                warm_bare = (~l_snow) & (~l_cold)
                sb = jnp.where(warm_bare, 0.0, sb)
                rhs = jnp.where(warm_bare, rhs + kup * 0.0, rhs)
            if k == ni - 1:
                sp = zeros
                rhs = rhs + kdn * Tbot
            SB[r], D[r], SP[r], R[r] = sb, diag, sp, rhs

        Tmat = _tridiag(jnp.stack(SB, -1), jnp.stack(D, -1),
                        jnp.stack(SP, -1), jnp.stack(R, -1))

        Tsf_new = jnp.where(
            l_cold, jnp.where(l_snow, Tmat[..., 0], Tmat[..., ns]), 0.0)
        # two-stage switch (reference two_stage_solver_*): a cold solve
        # ending above melt restarts as a melting surface
        went_melt = Tsf_new > 0.0
        Tsf_new = jnp.minimum(Tsf_new, 0.0)
        zTsn_new = jnp.where(l_snow[..., None],
                             jnp.minimum(Tmat[..., 1:ns + 1], 0.0), 0.0)
        zTin_new = Tmat[..., ns + 1:]

        # damp the liquid-fraction feedback: near the liquidus the
        # frozen-phi linearization oscillates (latent heat jumps), so
        # under-relax phi and, when the temperature iterate oscillates,
        # average it with the previous iterate (the BL99 cond-2 trick)
        osc = (zTin_new - zTin) * (zTin - zTin_pp) < 0.0
        zTin_new = jnp.where(osc, 0.5 * (zTin_new + zTin), zTin_new)
        phi_new = 0.5 * phi + 0.5 * liquid_fraction(zTin_new, zSin)

        # convergence: temperature change + energy closure (reference
        # check_picard_convergence)
        dT = jnp.maximum(
            jnp.abs(Tsf_new - Tsf),
            jnp.maximum(jnp.abs(zTsn_new - zTsn).max(-1),
                        jnp.abs(zTin_new - zTin).max(-1)))
        zqin_new = enthalpy_mush(zTin_new, zSin)
        zqsn_new = snow_enthalpy_from_temperature(zTsn_new)
        efinal = (hil[..., None] * zqin_new).sum(-1) + \
            jnp.where(l_snow, (hsl[..., None] * zqsn_new).sum(-1), 0.0)
        fcondtop = jnp.where(
            l_snow,
            kc[..., 0] / dxp[..., 0] * (Tsf_new - zTsn_new[..., 0]),
            kc[..., 0] / jnp.maximum(dxp[..., 0], c.PUNY) *
            (Tsf_new - zTin_new[..., 0]))
        fcondbot = 2.0 * km[..., ni - 1] * (zTin_new[..., ni - 1] -
                                            Tbot) / hil
        ferr = jnp.abs((efinal - einit) / dt -
                       (fcondtop - fcondbot + fswint))
        conv = (dT < DT_ERRMAX) & (ferr < 0.9 * c.FERRMAX) & ~went_melt

        fsurfn_out = fsurfn + (Tsf_new - Tsf) * dfsurf_dT

        def sel(new, old):
            cexp = converged.reshape(converged.shape + (1,) *
                                     (new.ndim - converged.ndim))
            return jnp.where(cexp, old, new)

        return (sel(Tsf_new, Tsf), sel(zTsn_new, zTsn),
                sel(zTin_new, zTin), sel(phi_new, phi),
                sel(Tsf, Tsf_pp), sel(zTsn, zTsn_pp),
                sel(zTin, zTin_pp),
                sel(fsurfn_out, fsurf_p), sel(fcondtop, fct_p),
                sel(fcondbot, fcb_p),
                sel(flwoutn, flw_p), sel(fsensn, fsn_p),
                sel(flatn, flt_p),
                converged | conv, niter + 1)

    def cond_fn(carry):
        return (~jnp.all(carry[-2])) & (carry[-1] <= NITERMAX)

    init = (Tsf, zTsn, zTin, phi, Tsf, zTsn, zTin,
            zeros, zeros, zeros, zeros, zeros, zeros,
            jnp.zeros(Tsf.shape, bool), jnp.array(1))
    out = jax.lax.while_loop(cond_fn, one_iteration, init)
    (Tsf_f, zTsn_f, zTin_f, phi_f, _, _, _, fsurf_f, fct_f, fcb_f,
     flwout_f, fsens_f, flat_f, conv_f, _) = out

    zqin_f = enthalpy_mush(zTin_f, zSin)
    zqsn_f = snow_enthalpy_from_temperature(zTsn_f)
    return MushySolveResult(
        Tsf=Tsf_f, zTsn=zTsn_f, zTin=zTin_f, zqsn=zqsn_f, zqin=zqin_f,
        phi=phi_f, fsensn=fsens_f, flatn=flat_f, flwoutn=flwout_f,
        fsurfn=fsurf_f, fcondtopn=fct_f, fcondbot=fcb_f,
        converged=conv_f)
