"""Melt ponds (CESM scheme) and the simple age / first-year-ice tracers.

TPU-native re-design of `ice_meltpond_cesm.F90` (compute_ponds_cesm),
`ice_age.F90` and `ice_firstyear.F90`; vectorized over [*B, nCat].
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constants as c

PNDASPECT = 0.8      # pond depth / pond fraction ratio (namelist default)
HI_MIN_POND = 0.01
TD = 2.0             # freeze-up temperature difference (C)
REXP = 0.01          # pond contraction scaling
DPTHHI = 0.9         # max pond depth / ice thickness


def compute_ponds_cesm(dt, rfrac, meltt, melts, frain,
                       aicen, vicen, vsnon, Tsfcn, apnd, hpnd,
                       pndaspect: float = PNDASPECT):
    """CESM melt ponds: retained meltwater volume grows ponds, cold
    surfaces contract them (reference compute_ponds_cesm,
    ice_meltpond_cesm.F90). All inputs [*B, nCat]; apnd is the pond
    fraction OF ICE AREA, hpnd the pond depth (m).
    Returns (apnd, hpnd)."""
    has = aicen > c.PUNY
    safe_a = jnp.where(has, aicen, 1.0)
    hi = jnp.where(has, vicen / safe_a, 0.0)

    volpn = hpnd * apnd * aicen
    volpn = volpn + (rfrac / c.RHOFRESH) * (
        meltt * c.RHOI + melts * c.RHOS + frain * dt) * aicen
    Tp = c.TIMELT - TD
    dTs = jnp.maximum(Tp - Tsfcn, 0.0)
    volpn = jnp.maximum(volpn * jnp.exp(REXP * dTs / Tp), 0.0)
    apondn = jnp.minimum(jnp.sqrt(volpn / (pndaspect * safe_a)), 1.0)
    hpondn = pndaspect * apondn
    apondn = apondn * aicen
    hpondn = jnp.minimum(hpondn, DPTHHI * hi)

    thick_enough = has & (hi >= HI_MIN_POND)
    apnd_new = jnp.where(thick_enough, apondn / safe_a, 0.0)
    hpnd_new = jnp.where(thick_enough, hpondn, 0.0)
    return apnd_new, hpnd_new


def increment_age(dt, iage, vicen):
    """Ice age tracer: existing ice ages by dt (reference ice_age.F90
    increment_age)."""
    return jnp.where(vicen > c.PUNY, iage + dt, 0.0)


def update_first_year_area(day_of_year, fy_area, aicen,
                           lat_sign_positive=True):
    """First-year ice resets to zero at the autumn equinox per
    hemisphere (reference ice_firstyear.F90 update_FYarea: day 265
    north, day 81 south)."""
    reset_day = 265 if lat_sign_positive else 81
    reset = day_of_year == reset_day
    fy = jnp.where(reset, 0.0, fy_area)
    return jnp.clip(fy, 0.0, 1.0)
