"""ITD thermodynamics (therm2 pieces): frazil new-ice formation and
lateral melt (reference `ice_therm_itd.F90`: add_new_ice :1027-1523,
lateral_melt :848-1005). BL99 (ktherm=1) path. Vectorized over cells.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np
import jax.numpy as jnp

from . import constants as c


class NewIceResult(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    area_tracers: Dict[str, jnp.ndarray]
    ice_tracers: Dict[str, jnp.ndarray]
    frazil: jnp.ndarray       # frazil growth this step (m)
    dfresh: jnp.ndarray       # freshwater flux change (kg/m^2/s)
    dfsalt: jnp.ndarray       # salt flux change (kg/m^2/s)


def add_new_ice(dt, hin_max: np.ndarray, aicen, vicen,
                area_tracers: Dict[str, jnp.ndarray],
                ice_tracers: Dict[str, jnp.ndarray],
                frzmlt, Tf, salin_profile: np.ndarray,
                dilute_ponds: bool = False) -> NewIceResult:
    """Frazil ice formation in open water (reference add_new_ice,
    BL99 branch). salin_profile: [nIceLayers] fixed salinity profile.

    Tracer updates for new ice follow the reference: new ice is level
    (levelIceArea/Volume mix toward 1), first-year (firstYearIceArea
    toward 1), age 0 (iceAge diluted); pond tracers are diluted when
    they ride directly on the ice area (cesm/topo schemes,
    dilute_ponds=True) and untouched for level-ice ponds."""
    ncat = aicen.shape[-1]
    ni = len(salin_profile)
    puny = c.PUNY

    aice = aicen.sum(-1)
    aice0 = jnp.maximum(1.0 - aice, 0.0)
    hi0max = hin_max[1] * 0.9 if ncat > 1 else 1.0e8

    qi0new = -c.RHOI * c.LFRESH
    fnew = jnp.maximum(frzmlt, 0.0)
    vi0new = -fnew * dt / qi0new
    frazil = vi0new

    # ocean fluxes from new ice formation (:update_ocn_f branch,
    # standalone always updates)
    dfresh = -c.RHOI * vi0new / dt
    dfsalt = c.ICE_REF_SALINITY * 1e-3 * dfresh

    # partition: new ice in open water vs spread under existing ice
    has_open = aice0 > puny
    hi0new = jnp.maximum(vi0new / jnp.maximum(aice0, puny),
                         c.HFRAZILMIN)
    too_thick = (hi0new > hi0max) & (aice0 + puny < 1.0)
    hi0new = jnp.where(too_thick, hi0max, hi0new)
    ai0new = jnp.where(
        has_open,
        jnp.where(too_thick, aice0, vi0new / jnp.maximum(hi0new, puny)),
        0.0)
    ai0new = jnp.where(vi0new > 0.0, ai0new, 0.0)
    vsurp_tot = jnp.where(
        has_open & too_thick, vi0new - ai0new * hi0new,
        jnp.where(has_open, 0.0, vi0new))
    vsurp_tot = jnp.where(vi0new > 0.0, vsurp_tot, 0.0)
    hsurp = vsurp_tot / jnp.maximum(aice, puny)
    hsurp = jnp.where(aice > puny, hsurp, 0.0)
    vi0new_cat1 = jnp.where(has_open, vi0new - vsurp_tot, 0.0)
    vi0new_cat1 = jnp.maximum(vi0new_cat1, 0.0)

    # spread hsurp under all categories, mixing enthalpy/salinity
    new_it = dict(ice_tracers)
    sprof = jnp.asarray(salin_profile, aicen.dtype)
    if hsurp is not None:
        vsurp_n = hsurp[..., None] * aicen          # [*B, ncat]
        vtmp = vicen + vsurp_n
        if "iceEnthalpy" in new_it:
            q = new_it["iceEnthalpy"]
            mixed = (q * vicen[..., None] + qi0new * vsurp_n[..., None]) \
                / jnp.maximum(vtmp[..., None], puny)
            new_it["iceEnthalpy"] = jnp.where(vtmp[..., None] > 0.0,
                                              mixed, q)
        if "iceSalinity" in new_it:
            s = new_it["iceSalinity"]
            sp = jnp.broadcast_to(sprof, s.shape)
            mixed = (s * vicen[..., None] + sp * vsurp_n[..., None]) \
                / jnp.maximum(vtmp[..., None], puny)
            new_it["iceSalinity"] = jnp.where(vtmp[..., None] > 0.0,
                                              mixed, s)
        if "levelIceVolume" in new_it:
            # new frazil volume is all level ice
            vl = new_it["levelIceVolume"]
            mixed = (vl * vicen + vsurp_n) / jnp.maximum(vtmp, puny)
            new_it["levelIceVolume"] = jnp.where(vtmp > 0.0, mixed, vl)
        vicen = vtmp

    # add category-1 new ice
    area1 = aicen[..., 0]
    vice1 = vicen[..., 0]
    a1 = area1 + ai0new
    v1 = vice1 + vi0new_cat1
    aicen = aicen.at[..., 0].set(a1)
    vicen = vicen.at[..., 0].set(v1)
    new_at = dict(area_tracers)
    if "surfaceTemperature" in new_at:
        t = new_at["surfaceTemperature"]
        t1 = (t[..., 0] * area1 + Tf * ai0new) / jnp.maximum(a1, puny)
        t1 = jnp.minimum(t1, 0.0)
        new_at["surfaceTemperature"] = t.at[..., 0].set(
            jnp.where(a1 > puny, t1, t[..., 0]))
    if "iceEnthalpy" in new_it:
        q = new_it["iceEnthalpy"]
        q1 = (q[..., 0, :] * vice1[..., None] +
              qi0new * vi0new_cat1[..., None]) / \
            jnp.maximum(v1[..., None], puny)
        new_it["iceEnthalpy"] = q.at[..., 0, :].set(
            jnp.where(v1[..., None] > puny, q1, q[..., 0, :]))
    if "iceSalinity" in new_it:
        s = new_it["iceSalinity"]
        sp = jnp.broadcast_to(sprof, s[..., 0, :].shape)
        s1 = (s[..., 0, :] * vice1[..., None] +
              sp * vi0new_cat1[..., None]) / \
            jnp.maximum(v1[..., None], puny)
        new_it["iceSalinity"] = s.at[..., 0, :].set(
            jnp.where(v1[..., None] > puny, s1, s[..., 0, :]))

    def mix_area_cat1(name, new_value):
        if name not in new_at:
            return
        t = new_at[name]
        t1 = (t[..., 0] * area1 + new_value * ai0new) / \
            jnp.maximum(a1, puny)
        new_at[name] = t.at[..., 0].set(
            jnp.where(a1 > puny, t1, t[..., 0]))

    mix_area_cat1("iceAge", 0.0)               # new ice has age 0
    mix_area_cat1("firstYearIceArea", 1.0)     # ... is first-year
    mix_area_cat1("levelIceArea", 1.0)         # ... is level
    if dilute_ponds:
        for name in ("pondArea", "pondDepth", "pondLidThickness"):
            mix_area_cat1(name, 0.0)
    if "levelIceVolume" in new_it:
        vl = new_it["levelIceVolume"]
        vl1 = (vl[..., 0] * vice1 + vi0new_cat1) / jnp.maximum(v1, puny)
        new_it["levelIceVolume"] = vl.at[..., 0].set(
            jnp.where(v1 > puny, vl1, vl[..., 0]))

    return NewIceResult(aicen=aicen, vicen=vicen,
                        area_tracers=new_at, ice_tracers=new_it,
                        frazil=frazil, dfresh=dfresh, dfsalt=dfsalt)


class LateralMeltResult(NamedTuple):
    aicen: jnp.ndarray
    vicen: jnp.ndarray
    vsnon: jnp.ndarray
    meltl: jnp.ndarray        # lateral melt volume (m)
    dfresh: jnp.ndarray       # kg/m^2/s
    dfsalt: jnp.ndarray
    dfhocn: jnp.ndarray       # W/m^2 (negative: ocean loses heat)


def lateral_melt(dt, aicen, vicen, vsnon,
                 ice_enthalpy, snow_enthalpy, rside) -> LateralMeltResult:
    """Melt a fraction rside of every category laterally
    (reference lateral_melt, ice_therm_itd.F90:848-1005)."""
    r = rside[..., None]
    dfresh = ((c.RHOS * vsnon + c.RHOI * vicen) * r).sum(-1) / dt
    dfsalt = (c.RHOI * vicen * r).sum(-1) * \
        c.ICE_REF_SALINITY * 1e-3 / dt
    meltl = (vicen * r).sum(-1)
    aicen_n = aicen * (1.0 - r)
    vicen_n = vicen * (1.0 - r)
    vsnon_n = vsnon * (1.0 - r)
    # heat needed to melt the removed ice/snow comes from the ocean
    # (note the reference uses post-melt volumes in the flux; :960-973)
    dfhocn = (ice_enthalpy.mean(-1) * r * vicen_n).sum(-1) / dt \
        + (snow_enthalpy.mean(-1) * r * vsnon_n).sum(-1) / dt
    return LateralMeltResult(aicen=aicen_n, vicen=vicen_n, vsnon=vsnon_n,
                             meltl=meltl, dfresh=dfresh, dfsalt=dfsalt,
                             dfhocn=dfhocn)
