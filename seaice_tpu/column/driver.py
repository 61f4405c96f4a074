"""Column-physics phase drivers.

TPU-native re-design of the reference's MPAS <-> column adapter phase
drivers (`mpas_seaice_column.F`: predynamics :1038, dynamics :1139,
postdynamics :1208) and the colpkg step routines they call
(`ice_colpkg.F90`: colpkg_step_therm1/_therm2/_step_ridge): instead of
an OpenMP loop over cells calling scalar colpkg routines with ~100
array-slice arguments, each phase is one fused vectorized kernel over
[nCells, nCategories] columns.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import numpy as np
import jax.numpy as jnp

from . import constants as c
from .atmo import atmo_boundary_layer
from .itd import category_boundaries, cleanup_small_ice, linear_itd_remap
from .itd_thermo import add_new_ice, lateral_melt
from .ridging import ridge_ice
from .shortwave import shortwave_ccsm3
from .thermo_shared import salinity_profile
from .vertical import frzmlt_bottom_lateral, thermo_vertical
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class AtmosForcing:
    """Cell-centered atmospheric state (reference atmos_coupling pool)."""
    air_temperature: Any       # K (potential temperature)
    specific_humidity: Any     # kg/kg
    u_air: Any                 # m/s
    v_air: Any
    longwave_down: Any         # W/m^2
    sw_vis_dir: Any            # W/m^2
    sw_vis_dif: Any
    sw_ir_dir: Any
    sw_ir_dif: Any
    rain_rate: Any             # kg/m^2/s
    snow_rate: Any             # kg/m^2/s
    air_density: Any           # kg/m^3
    air_level_height: Any      # m


@pytree_dataclass
class OceanForcing:
    """Cell-centered ocean state (reference ocean_coupling pool)."""
    sst: Any                   # deg C
    sss: Any                   # ppt
    freezing_temperature: Any  # deg C
    frzmlt: Any                # freezing/melting potential W/m^2
    mixed_layer_depth: Any     # m


@pytree_dataclass
class ColumnFluxes:
    """Aggregate cell fluxes for the coupler/diagnostics."""
    fresh: Any                 # freshwater to ocean (kg/m^2/s)
    fsalt: Any                 # salt to ocean (kg/m^2/s)
    fhocn: Any                 # heat to ocean (W/m^2)
    fswthru: Any               # SW through ice to ocean (W/m^2)
    evap: Any                  # evaporation (kg/m^2/s)
    fsens: Any                 # sensible heat (W/m^2)
    flat: Any                  # latent heat (W/m^2)
    flwout: Any                # outgoing longwave (W/m^2)
    congel: Any                # congelation growth (m)
    frazil: Any                # frazil growth (m)
    snoice: Any                # snow-ice growth (m)
    meltt: Any                 # top melt (m)
    meltb: Any                 # bottom melt (m)
    melts: Any                 # snow melt (m)
    meltl: Any                 # lateral melt (m)
    albedo_vis_dir: Any        # area-weighted albedos
    albedo_ir_dir: Any
    albedo_vis_dif: Any
    albedo_ir_dif: Any


def _split_tracers(tracers: Dict[str, Any]):
    aicen = tracers["iceAreaCategory"]
    vicen = tracers["iceVolumeCategory"]
    vsnon = tracers["snowVolumeCategory"]
    at = {"surfaceTemperature": tracers["surfaceTemperature"]}
    it_ = {"iceEnthalpy": tracers["iceEnthalpy"],
           "iceSalinity": tracers["iceSalinity"]}
    st = {"snowEnthalpy": tracers["snowEnthalpy"]}
    return aicen, vicen, vsnon, at, it_, st


def _merge_tracers(tracers, aicen, vicen, vsnon, at, it_, st):
    out = dict(tracers)
    out["iceAreaCategory"] = aicen
    out["iceVolumeCategory"] = vicen
    out["snowVolumeCategory"] = vsnon
    out["surfaceTemperature"] = at["surfaceTemperature"]
    out["iceEnthalpy"] = it_["iceEnthalpy"]
    out["iceSalinity"] = it_["iceSalinity"]
    out["snowEnthalpy"] = st["snowEnthalpy"]
    return out


class ColumnPhysics:
    """Owns static column configuration (category bounds, salinity
    profile) and provides the phase kernels."""

    def __init__(self, n_categories: int, n_ice_layers: int,
                 n_snow_layers: int = 1, kcatbound: int = 0,
                 kitd: int = 1, krdg_partic: int = 1,
                 krdg_redist: int = 1, mu_rdg: float = 4.0,
                 natmiter: int = 5, shortwave: str = "ccsm3"):
        self.ncat = n_categories
        self.ni = n_ice_layers
        self.ns = n_snow_layers
        self.hin_max = category_boundaries(n_categories, kcatbound, kitd)
        self.salin = salinity_profile(n_ice_layers)
        self.krdg_partic = krdg_partic
        self.krdg_redist = krdg_redist
        self.mu_rdg = mu_rdg
        self.natmiter = natmiter
        self.shortwave = shortwave

    # -- therm1 + therm2 (predynamics; reference column.F:1038-1137) -----

    def step_thermodynamics(self, dt, tracers: Dict[str, Any],
                            atm: AtmosForcing, ocn: OceanForcing,
                            strocnx=None, strocny=None, coszen=None):
        """Vertical + ITD thermodynamics for one coupling step.

        coszen: cosine solar zenith (cell field), used by the dEdd
        shortwave — compute with column.orbital.compute_coszen; if
        absent, a rough estimate from the incident flux.
        Returns (new tracers, ColumnFluxes)."""
        aicen, vicen, vsnon, at, it_, st = _split_tracers(tracers)
        tsfc = at["surfaceTemperature"]
        qin = it_["iceEnthalpy"]
        sin = it_["iceSalinity"]
        qsn = st["snowEnthalpy"]
        ncat = self.ncat

        def pc(x):   # broadcast cell field over categories
            return x[..., None] * jnp.ones_like(aicen)

        wind = jnp.sqrt(atm.u_air ** 2 + atm.v_air ** 2)

        # shortwave partition (reference column_prep/step_radiation;
        # scheme selected by config_albedo_type 'ccsm3' | 'dEdd')
        if self.shortwave == "dEdd":
            from .dedd import shortwave_dedd
            if coszen is None:
                sw_tot = (atm.sw_vis_dir + atm.sw_vis_dif +
                          atm.sw_ir_dir + atm.sw_ir_dif)
                coszen = jnp.clip(sw_tot / 800.0, 0.05, 1.0)
            sw = shortwave_dedd(aicen, vicen, vsnon, tsfc, coszen,
                                atm.sw_vis_dir, atm.sw_vis_dif,
                                atm.sw_ir_dir, atm.sw_ir_dif,
                                self.ni, self.ns)
        else:
            sw = shortwave_ccsm3(aicen, vicen, vsnon, tsfc,
                                 atm.sw_vis_dir, atm.sw_vis_dif,
                                 atm.sw_ir_dir, atm.sw_ir_dif,
                                 self.ni, self.ns)

        # atmosphere boundary layer per category
        ab = atmo_boundary_layer(
            tsfc, pc(atm.air_temperature), pc(atm.u_air), pc(atm.v_air),
            pc(wind), pc(atm.air_level_height),
            pc(atm.specific_humidity), pc(atm.air_density),
            natmiter=self.natmiter)

        # ocean-ice bottom flux + lateral melt fraction
        aice = aicen.sum(-1)
        hilyr_e = jnp.maximum(vicen, 0.0) / self.ni
        hslyr_e = jnp.maximum(vsnon, 0.0) / self.ns
        etot = ((hilyr_e[..., None] * qin).sum((-2, -1)) +
                (hslyr_e[..., None] * qsn).sum((-2, -1)))
        if strocnx is None:
            strocnx = jnp.zeros_like(aice)
            strocny = jnp.zeros_like(aice)
        Tbot, fbot_cell, rside = frzmlt_bottom_lateral(
            dt, aice, ocn.frzmlt, ocn.sst, ocn.freezing_temperature,
            strocnx, strocny, etot)
        # partition fbot over categories by area fraction
        fbot = jnp.where(aicen > c.PUNY,
                         fbot_cell[..., None] * aicen /
                         jnp.maximum(aice[..., None], c.PUNY), 0.0)

        aicen_init = aicen
        vicen_init = vicen

        # vertical thermodynamics (therm1)
        tv = thermo_vertical(
            dt, aicen, vicen, vsnon, tsfc, qin, qsn,
            jnp.broadcast_to(jnp.asarray(self.salin, qin.dtype),
                             qin.shape),
            flw=pc(atm.longwave_down), potT=pc(atm.air_temperature),
            Qa=pc(atm.specific_humidity), rhoa=pc(atm.air_density),
            fsnow=pc(atm.snow_rate), fbot=fbot,
            Tbot=pc(Tbot),
            fswsfc=sw.fswsfc, fswint=sw.fswint,
            Sswabs=sw.Sswabs, Iswabs=sw.Iswabs,
            shcoef=ab.shcoef, lhcoef=ab.lhcoef)

        aicen2 = aicen
        vicen2 = tv.hin * aicen
        vsnon2 = tv.hsn * aicen
        at2 = {"surfaceTemperature": tv.Tsf}
        it2 = {"iceEnthalpy": tv.zqin, "iceSalinity": sin}
        st2 = {"snowEnthalpy": tv.zqsn}

        # aggregate per-category atmosphere fluxes (area-weighted)
        def agg(x):
            return (x * aicen).sum(-1)

        fsens = agg(tv.fsensn)
        flat = agg(tv.flatn)
        flwout = agg(tv.flwoutn) - (1.0 - c.EMISSIVITY) * \
            aice * atm.longwave_down
        fswthru = agg(sw.fswthru)
        evap = agg(tv.evapn)
        fhocn = agg(tv.fhocnn)
        fresh = tv.freshn.sum(-1)
        fsalt = tv.fsaltn.sum(-1)

        # frazil formation (therm2; reference column.F:2086-2460)
        ni_res = add_new_ice(dt, self.hin_max, aicen2, vicen2, at2, it2,
                             ocn.frzmlt, ocn.freezing_temperature,
                             self.salin)
        aicen2, vicen2 = ni_res.aicen, ni_res.vicen
        at2, it2 = ni_res.area_tracers, ni_res.ice_tracers
        fresh = fresh + ni_res.dfresh
        fsalt = fsalt + ni_res.dfsalt

        # lateral melt
        lm = lateral_melt(dt, aicen2, vicen2, vsnon2,
                          it2["iceEnthalpy"], st2["snowEnthalpy"], rside)
        aicen2, vicen2, vsnon2 = lm.aicen, lm.vicen, lm.vsnon
        fresh = fresh + lm.dfresh
        fsalt = fsalt + lm.dfsalt
        fhocn = fhocn + lm.dfhocn

        # ITD linear remap between categories
        if ncat > 1:
            (aicen2, vicen2, vsnon2, at2, it2, st2) = linear_itd_remap(
                self.hin_max, aicen_init, vicen_init,
                aicen2, vicen2, vsnon2, at2, it2, st2)

        # cleanup tiny categories
        (aicen2, vicen2, vsnon2, at2, it2, st2, dfresh_z,
         dheat_z) = cleanup_small_ice(aicen2, vicen2, vsnon2, at2, it2,
                                      st2)
        fresh = fresh + dfresh_z / dt
        fhocn = fhocn + dheat_z / dt

        fluxes = ColumnFluxes(
            fresh=fresh, fsalt=fsalt, fhocn=fhocn, fswthru=fswthru,
            evap=evap, fsens=fsens, flat=flat, flwout=flwout,
            congel=agg(tv.congel), frazil=ni_res.frazil,
            snoice=agg(tv.snoice), meltt=agg(tv.meltt),
            meltb=agg(tv.meltb), melts=agg(tv.melts), meltl=lm.meltl,
            albedo_vis_dir=agg(sw.alvdr), albedo_ir_dir=agg(sw.alidr),
            albedo_vis_dif=agg(sw.alvdf), albedo_ir_dif=agg(sw.alidf))

        return _merge_tracers(tracers, aicen2, vicen2, vsnon2, at2, it2,
                              st2), fluxes

    # -- ridging (dynamics phase; reference column.F:3283-3560) ----------

    def step_ridging(self, dt, tracers: Dict[str, Any],
                     ridge_convergence, ridge_shear):
        """Mechanical redistribution after transport.

        ridge_convergence/shear: cell fields from the velocity solver
        diagnostics (1/s; the EVP driver returns these unconverted,
        unlike divergence/shear which carry CICE %/day units)."""
        aicen, vicen, vsnon, at, it_, st = _split_tracers(tracers)
        res = ridge_ice(
            dt, self.hin_max,
            rdg_conv=jnp.maximum(ridge_convergence, 0.0),
            rdg_shear=jnp.maximum(ridge_shear, 0.0),
            aicen=aicen, vicen=vicen, vsnon=vsnon,
            area_tracers=at, ice_tracers=it_, snow_tracers=st,
            krdg_partic=self.krdg_partic, krdg_redist=self.krdg_redist,
            mu_rdg=self.mu_rdg)
        out = _merge_tracers(tracers, res.aicen, res.vicen, res.vsnon,
                             res.area_tracers, res.ice_tracers,
                             res.snow_tracers)
        extra = {"dardg1dt": res.dardg1dt, "dardg2dt": res.dardg2dt,
                 "dvirdgdt": res.dvirdgdt, "opening": res.opening,
                 "ridge_fresh": res.msnow_mlt / dt,
                 "ridge_fhocn": res.esnow_mlt / dt}
        return out, extra


def slab_ocean_frzmlt(sst, Tf, mixed_layer_depth, dt):
    """Freezing/melting potential of a slab mixed layer (reference
    colpkg_ocn_mixed_layer / MPAS ocean coupling): the heat required to
    bring the mixed layer to the freezing point in one step, clipped to
    +-1000 W/m^2."""
    f = (Tf - sst) * c.CPRHO * mixed_layer_depth / dt
    return jnp.clip(f, -1000.0, 1000.0)
