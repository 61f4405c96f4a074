"""Aerosol tracers in snow and ice (reference `ice_aerosol.F90`,
update_aerosol :29-440).

Each aerosol species carries four pools per category (the reference
layout): snow surface layer (ssl), snow interior, ice surface layer,
ice interior (kg/m^2). Deposition loads the snow ssl; melt at each
surface moves aerosol along with the melted thickness fraction, scaled
by the species' scavenging efficiency (kscav, reference values); bottom
growth leaves pools unchanged; pools riding on fully melted snow/ice
flush to the ocean. Vectorized over [*B, nCat, nAero, 4].
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from . import constants as c

# scavenging efficiencies per species class (reference kscavz /
# kscav for black carbon x2 and dust x4)
KSCAV_DEFAULT = np.array([0.03, 0.20, 0.02, 0.02, 0.01, 0.01])
HS_SSL = 0.04    # snow surface layer thickness (m; reference hs_ssl)
HI_SSL = 0.05    # ice surface layer thickness (m)

SNOW_SSL, SNOW_INT, ICE_SSL, ICE_INT = 0, 1, 2, 3


class AerosolResult(NamedTuple):
    aero: jnp.ndarray        # [*B, nCat, nAero, 4]
    flux_ocn: jnp.ndarray    # [*B, nAero] kg/m^2/s to the ocean


def update_aerosol(dt, aero, aicen, vicen, vsnon,
                   melts, meltt, meltb, congel, snoice, hsn_new,
                   faero_atm, kscav=None) -> AerosolResult:
    """One step of aerosol pool transfers (reference update_aerosol).

    aero [*B, nCat, nAero, 4] pools (kg/m^2, per unit ice area);
    melts/meltt/meltb/congel/snoice/hsn_new [*B, nCat] (m of
    snow/ice change this step); faero_atm [*B, nAero] deposition
    (kg/m^2/s, cell mean — distributed by category area)."""
    if kscav is None:
        kscav = KSCAV_DEFAULT[:aero.shape[-2]]
    kscav = jnp.asarray(kscav, aero.dtype)[..., :, None] * 0 + \
        jnp.asarray(kscav, aero.dtype)[:, None]      # [nAero, 1]

    has = aicen > c.PUNY
    safe_a = jnp.where(has, aicen, 1.0)
    hsn = jnp.where(has, vsnon / safe_a, 0.0)
    hin = jnp.where(has, vicen / safe_a, 0.0)

    a = aero
    flux = jnp.zeros(a.shape[:-3] + (a.shape[-2],), a.dtype)

    def frac(d, h):
        return jnp.clip(d / jnp.maximum(h, c.PUNY), 0.0, 1.0)

    # deposition into the snow (or bare-ice) surface layer (:120-160)
    dep = faero_atm[..., None, :] * dt * \
        jnp.ones_like(aicen)[..., None]              # [*B, nCat, nAero]
    to_snow = (hsn > c.PUNY)[..., None]
    a = a.at[..., SNOW_SSL].add(jnp.where(to_snow, dep, 0.0))
    a = a.at[..., ICE_SSL].add(jnp.where(~to_snow, dep, 0.0))

    # snow melt: ssl depletes with the melted fraction of the ssl depth,
    # scavenged fraction leaves with meltwater (to the ice surface),
    # the rest migrates to the snow interior (:180-260 structure)
    f_melt_s = frac(melts, jnp.maximum(hsn, HS_SSL))[..., None]
    moved = a[..., SNOW_SSL] * f_melt_s
    scav = moved * kscav.T
    a = a.at[..., SNOW_SSL].add(-moved)
    a = a.at[..., ICE_SSL].add(scav)
    a = a.at[..., SNOW_INT].add(moved - scav)

    # ice top melt: ice ssl -> interior / ocean with scavenging
    f_melt_i = frac(meltt, jnp.maximum(hin, HI_SSL))[..., None]
    moved = a[..., ICE_SSL] * f_melt_i
    scav = moved * kscav.T
    a = a.at[..., ICE_SSL].add(-moved)
    a = a.at[..., ICE_INT].add(moved - scav)
    flux = flux + (scav * aicen[..., None]).sum(-2) / dt

    # bottom melt releases the proportional interior fraction (:300)
    f_bot = frac(meltb, hin)[..., None]
    released = a[..., ICE_INT] * f_bot
    a = a.at[..., ICE_INT].add(-released)
    flux = flux + (released * aicen[..., None]).sum(-2) / dt

    # snow-ice formation moves snow interior aerosol into the ice ssl
    f_si = frac(snoice * c.RHOI / c.RHOS, hsn)[..., None]
    moved = a[..., SNOW_INT] * f_si
    a = a.at[..., SNOW_INT].add(-moved)
    a = a.at[..., ICE_SSL].add(moved)

    # pools on vanished snow/ice flush to the ocean
    no_snow = (hsn <= c.PUNY)[..., None]
    for p in (SNOW_SSL, SNOW_INT):
        gone = jnp.where(no_snow, a[..., p], 0.0)
        a = a.at[..., p].add(-gone)
        flux = flux + (gone * aicen[..., None]).sum(-2) / dt
    no_ice = (hin <= c.PUNY)[..., None]
    for p in (ICE_SSL, ICE_INT):
        gone = jnp.where(no_ice, a[..., p], 0.0)
        a = a.at[..., p].add(-gone)
        flux = flux + (gone * aicen[..., None]).sum(-2) / dt

    return AerosolResult(aero=jnp.maximum(a, 0.0), flux_ocn=flux)
