"""Advanced snow physics: grain metamorphism, liquid drainage, wind
effects (reference `ice_snow.F90`).

Implemented vectorized over [*B, nCat, nSnowLayers]:
  * wet metamorphism (exact reference formula, snow_wet_metamorph :844),
  * dry (temperature-gradient) metamorphism with the reference's
    best-fit power law; the SNICAR (tau, kappa, drdt0) aging parameters
    are provided as arguments so the lookup-table values can be plugged
    in when table files are available (parametric defaults otherwise),
  * meltwater drainage through the snowpack (drain_snow :885, irreducible
    saturation S_r),
  * bulk wind loss of new snowfall to leads and wind compaction of the
    effective snow density (snow_redist '30percent'/bulk pieces :119),
  * effective snow density from the ice/liquid mass tracers
    (snow_effective_density :34).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import constants as c

S_WET = 4.22e5       # wet metamorphism rate constant (um^3/s-ish)
S_R = 0.033          # irreducible liquid saturation
RSNW_FALL = 54.526   # fresh snow grain radius (1e-6 m; SNICAR)
RSNW_TMAX = 1500.0   # max dry-metamorphism radius (1e-6 m)
# parametric stand-ins for the SNICAR aging table at typical polar
# conditions (tau [hr], kappa, drdt0 [um/hr])
TAU_DEFAULT = 8.7e4
KAPPA_DEFAULT = 0.56
DRDT0_DEFAULT = 1.1
RHOS_MAX = 450.0     # max compacted snow density (kg/m^3)
WIND_MIN = 10.0      # minimum wind for compaction (m/s)
DRHOS_DWIND = 27.3   # compaction factor (kg s/m^4)
SNOW_LOSS_FRAC = 0.3  # '30percent' scheme: snowfall fraction lost/blown


def snow_wet_metamorph(dt, rsnw, smice, smliq):
    """Grain growth from liquid water (reference snow_wet_metamorph):
    dr = S_wet * fliq^3 * dt / (4 pi r^2), fliq in percent (capped 10%)."""
    tot = smice + smliq
    ok = (tot > 0.0) & (rsnw > 0.0)
    fliq = jnp.where(ok, jnp.minimum(smliq / jnp.maximum(tot, c.PUNY),
                                     0.1) * 100.0, 0.0)
    dr = jnp.where(ok, S_WET * fliq ** 3 * dt /
                   (4.0 * c.PI * jnp.maximum(rsnw, c.PUNY) ** 2), 0.0)
    return dr


def snow_dry_metamorph(dt, rsnw, zqsn, Tsfc, zTin1, hsn, hin,
                       tau=TAU_DEFAULT, kappa=KAPPA_DEFAULT,
                       drdt0=DRDT0_DEFAULT):
    """Temperature-gradient grain growth (reference snow_dry_metamorph):
    dr/dt = drdt0 * (tau / (dr_fresh + tau))^(1/kappa), with the aging
    parameters (from the SNICAR table in the reference) as inputs.
    Single-snow-layer form of the gradient (nslyr=1 branch)."""
    ns = zqsn.shape[-1]
    dzs = hsn[..., None] / ns
    dzi = hin[..., None] / jnp.maximum(1, 1)
    zTsn = (c.LFRESH + zqsn / c.RHOS) / c.CP_ICE
    # interface temperature between snow bottom and top ice layer
    t_int = (zTsn * dzi + zTin1[..., None] * dzs) / \
        jnp.maximum(dzs + dzi, c.PUNY)
    dTdz = jnp.abs(t_int - Tsfc[..., None]) / \
        jnp.maximum(hsn[..., None], c.PUNY)
    del dTdz   # gradient feeds the table lookup; parametric default here
    dr_fresh = jnp.maximum(0.0, rsnw - RSNW_FALL)
    drdt = drdt0 * (tau / (dr_fresh + tau)) ** (1.0 / kappa)
    return drdt * (dt / 3600.0)


def update_snow_radius(dt, rsnw, aicen, vicen, vsnon, zqsn, Tsfc, zTin1,
                       smice, smliq):
    """Combined metamorphism update (reference update_snow_radius).
    rsnw [*B, nCat, ns]; returns (rsnw, smice, smliq)."""
    has = (vsnon > c.PUNY) & (vicen > c.PUNY)
    safe_a = jnp.where(aicen > c.PUNY, aicen, 1.0)
    hsn = jnp.where(aicen > c.PUNY, vsnon / safe_a, 0.0)
    hin = jnp.where(aicen > c.PUNY, vicen / safe_a, 0.0)
    dr_dry = snow_dry_metamorph(dt, rsnw, zqsn, Tsfc, zTin1, hsn, hin)
    dr_wet = snow_wet_metamorph(dt, rsnw, smice, smliq)
    r_new = jnp.minimum(RSNW_TMAX, rsnw + dr_dry + dr_wet)
    h = has[..., None]
    r_out = jnp.where(h, r_new,
                      jnp.clip(rsnw, RSNW_FALL, RSNW_TMAX))
    smice_out = jnp.where(h, smice, c.RHOS)
    smliq_out = jnp.where(h, smliq, 0.0)
    return r_out, smice_out, smliq_out


def drain_snow(dt, vsnon, aicen, smice, smliq):
    """Vertical meltwater percolation with irreducible saturation
    (reference drain_snow :885). smice/smliq [*B, nCat, ns] (kg/m^3).
    Returns (smliq, meltsliq [*B, nCat] liquid leaving the base,
    kg/m^2)."""
    ns = smliq.shape[-1]
    safe_a = jnp.where(aicen > c.PUNY, aicen, 1.0)
    hsn = jnp.where(aicen > c.PUNY, vsnon / safe_a, 0.0)
    hslyr = jnp.maximum(hsn / ns, c.PUNY)[..., None]
    active = (hsn > c.PUNY)[..., None]

    out_layers = []
    dlin = jnp.zeros_like(smliq[..., 0])
    for k in range(ns):
        sl = smliq[..., k] + dlin / hslyr[..., 0]
        phi_ice = jnp.minimum(1.0, smice[..., k] / c.RHOI)
        phi_liq = sl / c.RHOFRESH
        w_drain = jnp.maximum(
            0.0, (phi_liq - S_R * (1.0 - phi_ice)) / dt *
            c.RHOFRESH * hslyr[..., 0])
        dlout = w_drain * dt
        sl = sl - dlout / hslyr[..., 0]
        out_layers.append(jnp.where(active[..., 0], sl, smliq[..., k]))
        dlin = dlout
    meltsliq = jnp.where(active[..., 0], dlin, 0.0)
    return jnp.stack(out_layers, axis=-1), meltsliq


def wind_snow_loss(wind, snow_rate):
    """Bulk '30percent' scheme: a fraction of snowfall is blown into
    leads at high wind (reference snow_redist bulk branch). Returns
    (retained snowfall rate, loss rate), both [*B]."""
    gamma = jnp.clip((wind - WIND_MIN) / WIND_MIN, 0.0, 1.0)
    loss = SNOW_LOSS_FRAC * gamma * snow_rate
    return snow_rate - loss, loss


def wind_compaction(dt, wind, rhos_eff):
    """Wind compaction of the near-surface snow density (reference
    snow_redist: drhos/dt = drhosdwind * (wind - windmin), capped)."""
    drho = jnp.where(wind > WIND_MIN,
                     DRHOS_DWIND * (wind - WIND_MIN) * dt / 86400.0,
                     0.0)
    return jnp.minimum(rhos_eff + drho, RHOS_MAX)


def snow_effective_density(smice, smliq):
    """Effective snow density from the mass tracers (reference
    snow_effective_density :34)."""
    return smice + smliq
