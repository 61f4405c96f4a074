"""Vertical (z-layer) biogeochemistry.

TPU-native re-design of the reference zBGC stack:
`z_biogeochemistry` (`/root/reference/src/column/ice_algae.F90:794-1497`
— per-tracer vertical FCT advection-diffusion + reactions),
`algal_dyn` (:1505-2309 — the reaction network), and the zbio driver
(`:29-386`).  The brine microstructure inputs (porosity, diffusivity
iDin, Darcy velocity) come from `brine.py` (compute_micro_s_mushy /
update_hbrine).

Redesign notes (TPU-first, not a port):
  * The reference's per-tracer flux-corrected-transport matrix plus
    scalar tridiagonal solve becomes ONE batched implicit
    advection-diffusion solve on the static (nblyr+1)-point bio grid,
    unrolled Thomas algorithm over layers, vectorized over
    [cells, categories, tracers]; monotonicity is enforced by the
    implicit upwind advection + positivity clipping with conservative
    flux bookkeeping (the FCT anti-diffusion correction is omitted —
    first-order upwind transport, documented deviation).
  * Reactions implement the core `algal_dyn` network: light /
    nitrate+ammonium / silicate limited algal growth (Liebig minimum,
    with the Dunne grazing closure and temperature-dependent
    mortality), ammonium sources from grazing spillage / mortality /
    respiration, nitrification, and silicate uptake
    (ice_algae.F90:1884-2050).  DOC/DON/Fe/DMS pools of the full
    reference network are not yet carried.

Tracer layout: bio tracers are BRINE concentrations (mmol/m^3 of
brine) on the nblyr+1 interface grid; total content per unit ice area
= sum_k C_k phi_k hbr zspace_k, which the conservation checks use.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from . import constants as c
from .bgc import (SklBgcResult, SklBgcState, init_skl_bgc,
                  step_skl_bgc)   # re-export skeletal scheme

SECDAY = 86400.0


@dataclasses.dataclass(frozen=True)
class ZbgcParams:
    """Reaction parameters (reference Registry zbgc defaults:
    config_maximum_growth_rate_diatoms=1.44/day :1043, grow_Tdep=0.063
    :1058, fr_graze=0.19 :1073, mort_pre=0.007/day :1088,
    mort_Tdep=0.03 :1103, K_Nit=1.0 :1133, K_Am=0.3 :1148,
    K_Sil=4.0 :1163, R_Si2N=1.8 :893, alpha=0.3 :1013, beta=0.001
    :1028, k_nitrif=0.046/day :1273)."""
    n_algae: int = 1
    mu_max: float = 1.44            # 1/day
    grow_Tdep: float = 0.063        # 1/C
    fr_graze: float = 0.19
    graze_exponent: float = 0.333
    graze_conc: float = 1.36        # mmol N/m^3
    mort_pre: float = 0.007         # 1/day
    mort_Tdep: float = 0.03         # 1/C
    K_Nit: float = 1.0              # mmol/m^3
    K_Am: float = 0.3
    K_Sil: float = 4.0
    R_Si2N: float = 1.8
    R_chl2N: float = 2.1            # mg chla / mmol N
    chlabs: float = 0.03            # 1/m/(mg chla/m^3)
    alpha2max: float = 0.3          # light limitation 1/(W/m^2)
    beta2max: float = 0.001         # light inhibition 1/(W/m^2)
    T_max: float = 0.0
    fsal: float = 1.0
    fr_resp: float = 0.05
    fr_graze_s: float = 0.5         # spilled fraction of grazing
    fr_graze_e: float = 0.5         # excreted (to NH4) fraction
    fr_mort2min: float = 0.9        # mortality remineralized to NH4
    k_nitrif: float = 0.046         # 1/day
    max_loss: float = 0.9
    op_dep_min: float = 0.1
    algal_vel: float = 1.11e-8      # m/s (Lavoie 2005)
    # ocean boundary concentrations (mmol/m^3)
    ocean_N: float = 0.16
    ocean_Nit: float = 12.0
    ocean_Am: float = 1.0
    ocean_Sil: float = 25.0
    initbio_frac: float = 1.0
    frazil_scav: float = 1.0

    @property
    def n_bio(self) -> int:
        # [algae x n_algae, Nit, Am, Sil]
        return self.n_algae + 3

    def ocean_concentrations(self, dtype=jnp.float64):
        vals = [self.ocean_N] * self.n_algae + \
            [self.ocean_Nit, self.ocean_Am, self.ocean_Sil]
        return jnp.asarray(vals, dtype)


class ZbgcResult(NamedTuple):
    tracers: jnp.ndarray        # [*B, n_bio, nblyr+1] brine conc
    flux_bio: jnp.ndarray       # [*B, n_bio] to ocean (mmol/m^2/s)
    pp_net: jnp.ndarray         # net primary production (mmolN/m^2/s)
    grow_net: jnp.ndarray       # specific growth (1/s)
    up_NO: jnp.ndarray          # nitrate uptake (mmol/m^2/s)
    up_NH: jnp.ndarray          # ammonium uptake
    chla: jnp.ndarray           # column chlorophyll (mg/m^2)


def algal_reactions(dt, C_brine, fswpen, T_bot, p: ZbgcParams):
    """Reaction terms for one layer (reference algal_dyn
    :1505-2309 core network).  C_brine [*B, n_bio]; fswpen [*B] the
    penetrating shortwave in this layer; returns (react [*B, n_bio]
    concentration change over dt, grow [*B], upNO, upNH)."""
    na = p.n_algae
    Nin = C_brine[..., :na]                  # algal N per class
    Nit = C_brine[..., na]
    Am = C_brine[..., na + 1]
    Sil = C_brine[..., na + 2]

    chlin = p.R_chl2N * Nin
    op_dep = p.chlabs * chlin.sum(-1)
    Iavg = jnp.where(op_dep > p.op_dep_min,
                     fswpen * (1.0 - jnp.exp(-op_dep)) /
                     jnp.maximum(op_dep, c.PUNY),
                     fswpen)
    L_lim = (1.0 - jnp.exp(-p.alpha2max * Iavg)) * \
        jnp.exp(-p.beta2max * Iavg)
    dTemp = jnp.minimum(T_bot - p.T_max, 0.0)

    Nit_lim = Nit / (Nit + p.K_Nit)
    Am_lim = Am / (Am + p.K_Am)
    N_lim = jnp.minimum(1.0, Nit_lim + Am_lim)
    Sil_lim = Sil / (Sil + p.K_Sil)

    growmax = p.mu_max / SECDAY * \
        jnp.exp(p.grow_Tdep * dTemp)[..., None] * Nin * p.fsal
    lim = jnp.minimum(L_lim[..., None],
                      jnp.minimum(N_lim[..., None], Sil_lim[..., None]))
    grow = lim * growmax                         # mmol/m^3/s per class
    potU_Am = Am_lim[..., None] * growmax
    U_Am = jnp.minimum(grow, potU_Am)
    U_Nit = grow - U_Am
    U_Sil = p.R_Si2N * grow

    # cap total uptake at max_loss of the available pool (:1952-1956)
    def cap(U, pool):
        tot = U.sum(-1)
        f = jnp.minimum(1.0, p.max_loss * pool /
                        jnp.maximum(tot * dt, c.PUNY))
        return U * f[..., None]

    U_Nit = cap(U_Nit, Nit)
    U_Am = cap(U_Am, Am)
    U_Sil = cap(U_Sil, Sil)
    grow = jnp.minimum(U_Nit + U_Am, U_Sil / p.R_Si2N)
    fr_Am = jnp.where(grow > 0.0,
                      jnp.minimum(U_Am / jnp.maximum(grow, c.PUNY),
                                  1.0), 0.5)
    U_Am = fr_Am * grow
    U_Nit = (1.0 - fr_Am) * grow
    U_Sil = p.R_Si2N * grow

    # losses (:1994-1997)
    resp = p.fr_resp * grow
    graze = jnp.minimum(
        p.max_loss * Nin / dt,
        grow * p.fr_graze *
        jnp.maximum(Nin / p.graze_conc, c.PUNY) ** p.graze_exponent)
    mort = jnp.minimum(
        p.max_loss * Nin / dt,
        p.mort_pre * jnp.exp(p.mort_Tdep * dTemp)[..., None] *
        Nin / SECDAY)

    dN = (grow - graze - mort - resp) * dt
    graze_N = graze.sum(-1)
    mort_N = mort.sum(-1)
    resp_N = resp.sum(-1)

    # ammonium sources (:2019-2023) and nitrification (:2045-2050)
    Am_s = (resp_N + graze_N * (1.0 - p.fr_graze_s) * p.fr_graze_e +
            mort_N * p.fr_mort2min) * dt
    nitrif = p.k_nitrif / SECDAY * Am
    dAm = Am_s - (U_Am.sum(-1) + nitrif) * dt
    dNit = nitrif * dt - U_Nit.sum(-1) * dt
    dSil = -U_Sil.sum(-1) * dt

    react = jnp.concatenate(
        [dN, dNit[..., None], dAm[..., None], dSil[..., None]],
        axis=-1)
    return react, grow.sum(-1), U_Nit.sum(-1), U_Am.sum(-1)


def _thomas(a, b, cc, d):
    """Tridiagonal solve, unrolled over the (static) layer axis.
    a/b/cc/d: [*B, n] (a[0], cc[-1] ignored)."""
    n = d.shape[-1]
    cp = [cc[..., 0] / b[..., 0]]
    dp = [d[..., 0] / b[..., 0]]
    for k in range(1, n):
        m = b[..., k] - a[..., k] * cp[-1]
        m = jnp.where(jnp.abs(m) < 1e-30, 1e-30, m)
        cp.append(cc[..., k] / m)
        dp.append((d[..., k] - a[..., k] * dp[-1]) / m)
    x = [dp[-1]]
    for k in range(n - 2, -1, -1):
        x.append(dp[k] - cp[k] * x[-1])
    return jnp.stack(x[::-1], axis=-1)


def zbgc_transport_react(dt, C, iphin, iDin, darcy_v, hbr, hbr_old,
                         dh_bot, fswpen, T_bot, ocean_bio,
                         p: ZbgcParams, flux_bio_atm=None):
    """One z-biogeochemistry step for all tracers at once
    (reference z_biogeochemistry :794-1497).

    C [*B, n_bio, K] brine concentrations on the K=nblyr+1 igrid;
    iphin/iDin [*B, K]; darcy_v [*B] (m/s, <0 flushing downward);
    hbr/hbr_old [*B]; dh_bot [*B] bottom growth (+) / melt (-);
    fswpen [*B] shortwave at the ice interior; ocean_bio [n_bio]
    or [*B, n_bio].  flux_bio_atm [*B, n_bio]: atmospheric deposition
    (snow->brine source, mmol/m^2/s).
    Returns ZbgcResult."""
    K = C.shape[-1]
    nblyr = K - 1
    zspace = np.full(K, 1.0 / nblyr)
    zspace[0] *= 0.5
    zspace[-1] *= 0.5
    zspace_j = jnp.asarray(zspace, C.dtype)
    hbr_s = jnp.maximum(hbr, c.PUNY)
    ocean_b = jnp.broadcast_to(ocean_bio, C.shape[:-1])

    # --- implicit vertical diffusion + upwind Darcy advection -------
    # nondimensional advective velocity (1/s): Darcy flushing through
    # the brine column + algal motility for the algal classes
    w = darcy_v / jnp.maximum(iphin[..., K // 2], c.PUNY) / hbr_s
    # bottom-growth grid motion: new ice at the bottom pulls ocean
    # water in (scavenging source), melt expels to the ocean
    growth_vel = dh_bot / dt / hbr_s

    dx = 1.0 / nblyr
    flux_ocn = jnp.zeros(C.shape[:-1], C.dtype)
    C_new = []
    for m in range(C.shape[-2]):
        Cm = C[..., m, :]
        wm = w  # per-tracer motility could be added here
        # interface diffusivities (iDin defined on igrid, 1/s)
        Dif = 0.5 * (iDin[..., :-1] + iDin[..., 1:])     # [*B, K-1]
        lo = jnp.zeros_like(Cm)
        di = jnp.ones_like(Cm)
        up = jnp.zeros_like(Cm)
        rhs = Cm
        for k in range(K):
            d_dn = Dif[..., k] / dx ** 2 if k < K - 1 else 0.0
            d_up = Dif[..., k - 1] / dx ** 2 if k > 0 else 0.0
            # upwind advection: w>0 moves tracer downward (to larger k)
            a_dn = jnp.maximum(-wm, 0.0) / dx if k < K - 1 else 0.0
            a_up = jnp.maximum(wm, 0.0) / dx if k > 0 else 0.0
            diag = 1.0 + dt * (d_dn + d_up + a_dn + a_up)
            if k == K - 1:
                # bottom boundary: exchange with the ocean through the
                # molecular sublayer + growth scavenging
                ex = 2.0 * iDin[..., K - 1] / dx ** 2 + \
                    jnp.maximum(growth_vel, 0.0) / dx + \
                    jnp.maximum(wm, 0.0) / dx
                diag = diag + dt * ex
                rhs = rhs.at[..., k].add(
                    dt * ex * ocean_b[..., m] * p.frazil_scav)
            di = di.at[..., k].set(diag)
            if k > 0:
                lo = lo.at[..., k].set(-dt * (d_up + a_up))
            if k < K - 1:
                up = up.at[..., k].set(-dt * (d_dn + a_dn))
        Cs = _thomas(lo, di, up, rhs)
        # net exchange with the ocean (bulk content change bookkeeping
        # happens below via the column sums)
        C_new.append(Cs)
    C2 = jnp.stack(C_new, axis=-2)

    # atmospheric deposition into the top layer (zbgc_atm/snow source)
    if flux_bio_atm is not None:
        C2 = C2.at[..., 0].add(
            flux_bio_atm * dt /
            (jnp.maximum(iphin[..., 0] * hbr_s, c.PUNY) *
             zspace_j[0])[..., None])

    # --- reactions (per layer) --------------------------------------
    grow_net = jnp.zeros(C.shape[:-2], C.dtype)
    pp_net = jnp.zeros_like(grow_net)
    upNO = jnp.zeros_like(grow_net)
    upNH = jnp.zeros_like(grow_net)
    C3 = []
    for k in range(K):
        # shortwave decays toward the bottom of the column
        fk = fswpen * jnp.exp(-1.5 * (k / max(K - 1, 1)))
        react, grow_k, uNO, uNH = algal_reactions(
            dt, C2[..., k], fk, T_bot, p)
        C3.append(C2[..., k] + react)
        wgt = iphin[..., k] * hbr_s * float(zspace[k])
        pp_net = pp_net + grow_k * wgt
        upNO = upNO + uNO * wgt
        upNH = upNH + uNH * wgt
        grow_net = grow_net + grow_k
    C3 = jnp.stack(C3, axis=-1)

    # positivity with conservative ocean-flux bookkeeping: clipped
    # mass leaves/enters as ocean flux (reference adjust_tracer_profile)
    neg = jnp.minimum(C3, 0.0)
    flux_ocn = flux_ocn + (
        neg * iphin[..., None, :] * zspace_j).sum(-1) * hbr_s[..., None] / dt
    C3 = jnp.maximum(C3, 0.0)

    # content change from brine-height change (melt releases to ocean)
    shrink = jnp.minimum(hbr - hbr_old, 0.0)
    flux_ocn = flux_ocn - (
        C3 * iphin[..., None, :] * zspace_j).sum(-1) * \
        shrink[..., None] / dt

    na = p.n_algae
    chla = p.R_chl2N * (
        C3[..., :na, :] * iphin[..., None, :] *
        zspace_j).sum((-2, -1)) * hbr_s
    return ZbgcResult(tracers=C3, flux_bio=flux_ocn, pp_net=pp_net,
                      grow_net=grow_net / K, up_NO=upNO, up_NH=upNH,
                      chla=chla)
