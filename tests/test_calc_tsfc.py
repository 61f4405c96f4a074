"""calc_Tsfc=False (prescribed surface fluxes) coupled mode.

Reference: get_matrix_elements_know_Tsfc
(`/root/reference/src/column/ice_therm_bl99.F90:1242-1447`), the
`.not. calc_Tsfc` branches of temperature_changes (:377-684),
set_sfcflux (`ice_flux_colpkg.F90:174-288`), and the config guard
(`mpas_seaice_column.F:9259-9263`).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from seaice_tpu.column import constants as c
from seaice_tpu.column.bl99 import temperature_changes
from seaice_tpu.column.thermo_shared import (
    ice_enthalpy_from_temperature, snow_enthalpy_from_temperature)


def _cold_columns(n=8, ni=7, ns=1, seed=0):
    rng = np.random.default_rng(seed)
    dt = 3600.0
    hilyr = jnp.asarray(rng.uniform(0.1, 0.4, n))
    hslyr = jnp.asarray(
        np.where(rng.uniform(size=n) < 0.5,
                 rng.uniform(0.05, 0.3, n), 0.0))
    zTin = jnp.asarray(rng.uniform(-20.0, -2.0, (n, ni)))
    zSin = jnp.asarray(np.tile(np.linspace(1.0, 3.2, ni), (n, 1)))
    Tmlt = -zSin * c.DEPRESST
    zqin = ice_enthalpy_from_temperature(zTin, Tmlt)
    zTsn = jnp.asarray(rng.uniform(-25.0, -5.0, (n, ns)))
    zqsn = snow_enthalpy_from_temperature(zTsn)
    Tsf = jnp.asarray(rng.uniform(-30.0, -5.0, n))
    Tbot = jnp.full((n,), -1.8)
    einit = (hilyr[:, None] * zqin).sum(-1) + \
        jnp.where(hslyr > c.HS_MIN / ns,
                  (hslyr[:, None] * zqsn).sum(-1), 0.0)
    atm = dict(rhoa=jnp.full((n,), 1.3),
               flw=jnp.full((n,), 180.0),
               potT=jnp.full((n,), 253.0),
               Qa=jnp.full((n,), 5e-4),
               shcoef=jnp.full((n,), 10.0),
               lhcoef=jnp.full((n,), 15.0))
    # internal absorption consistent with fswint (no deposition into
    # nonexistent snow)
    l_snow = np.asarray(hslyr) > c.HS_MIN / ns
    Sswabs = jnp.asarray(np.where(l_snow[:, None], 0.5 / ns,
                                  0.0) * np.ones((n, ns)))
    sw = dict(fswsfc=jnp.full((n,), 5.0),
              fswint=jnp.asarray(0.5 + 0.5 * l_snow),
              Sswabs=Sswabs,
              Iswabs=jnp.full((n, ni), 0.5 / ni))
    return dict(dt=dt, hilyr=hilyr, hslyr=hslyr, zqin=zqin, zTin=zTin,
                zqsn=zqsn, zTsn=zTsn, zSin=zSin, Tsf=Tsf, Tbot=Tbot,
                einit=einit, **atm, **sw)


def _solve(p, **kw):
    return temperature_changes(
        p["dt"], p["rhoa"], p["flw"], p["potT"], p["Qa"], p["shcoef"],
        p["lhcoef"], p["fswsfc"], p["fswint"], p["Sswabs"], p["Iswabs"],
        p["hilyr"], p["hslyr"], p["zqin"], p["zTin"], p["zqsn"],
        p["zTsn"], p["zSin"], p["Tsf"], p["Tbot"], p["einit"], **kw)


def test_know_tsfc_reproduces_calc_tsfc_solution():
    """Feeding the converged calc_Tsfc=True surface fluxes back in as
    prescribed fluxes must reproduce the same interior temperatures:
    the know_Tsfc system is the calc system with the Tsf row
    eliminated at its solution."""
    p = _cold_columns()
    ref = _solve(p)
    ok = np.asarray(ref.converged)
    assert ok.sum() >= 3   # compare on the columns the standard
    #                        solver itself converged for

    got = _solve({**p, "Tsf": ref.Tsf},
                 calc_tsfc=False,
                 fsurfn_f=ref.fsurfn, fcondtopn_f=ref.fcondtopn,
                 flatn_f=ref.flatn, fsensn_f=ref.fsensn)
    assert bool(np.asarray(got.converged)[ok].all())
    # the prescribed-flux system solves the same tridiagonal with the
    # same boundary flux; small differences come from the extra
    # Picard iterations of the reference solve
    np.testing.assert_allclose(np.asarray(got.zTin)[ok],
                               np.asarray(ref.zTin)[ok], atol=0.15)
    # Tsf untouched, fluxes pass through exactly
    np.testing.assert_array_equal(np.asarray(got.Tsf),
                                  np.asarray(ref.Tsf))
    np.testing.assert_array_equal(np.asarray(got.fcondtopn)[ok],
                                  np.asarray(ref.fcondtopn)[ok])
    np.testing.assert_array_equal(np.asarray(got.fsurfn)[ok],
                                  np.asarray(ref.fsurfn)[ok])


def test_know_tsfc_energy_closure():
    """Condition 5 (energy conservation) still gates convergence with
    prescribed fluxes: (enew-einit)/dt = fcondtop - fcondbot + fswint
    to FERRMAX."""
    p = _cold_columns(seed=3)
    n = p["Tsf"].shape[0]
    pf = dict(fsurfn_f=jnp.full((n,), -20.0),
              fcondtopn_f=jnp.full((n,), -15.0),
              flatn_f=jnp.full((n,), -5.0),
              fsensn_f=jnp.full((n,), -8.0))
    got = _solve(p, calc_tsfc=False, **pf)
    assert bool(got.converged.all())
    ns = p["zTsn"].shape[-1]
    l_snow = np.asarray(p["hslyr"]) > c.HS_MIN / ns
    enew = (np.asarray(p["hilyr"])[:, None] *
            np.asarray(got.zqin)).sum(-1) + \
        np.where(l_snow, (np.asarray(p["hslyr"])[:, None] *
                          np.asarray(got.zqsn)).sum(-1), 0.0)
    lhs = (enew - np.asarray(p["einit"])) / p["dt"]
    rhs = (np.asarray(got.fcondtopn) - np.asarray(got.fcondbot) +
           np.asarray(got.fswint))
    np.testing.assert_allclose(lhs, rhs, atol=c.FERRMAX)


def test_prescribed_fluxes_change_the_answer():
    p = _cold_columns(seed=5)
    n = p["Tsf"].shape[0]
    a = _solve(p, calc_tsfc=False,
               fsurfn_f=jnp.full((n,), -20.0),
               fcondtopn_f=jnp.full((n,), -15.0),
               flatn_f=jnp.zeros((n,)), fsensn_f=jnp.zeros((n,)))
    b = _solve(p, calc_tsfc=False,
               fsurfn_f=jnp.full((n,), 5.0),
               fcondtopn_f=jnp.full((n,), 10.0),
               flatn_f=jnp.zeros((n,)), fsensn_f=jnp.zeros((n,)))
    assert np.abs(np.asarray(a.zTin) - np.asarray(b.zTin)).max() > 0.1


def test_mushy_plus_know_tsfc_is_a_config_error():
    from seaice_tpu.column.driver import ColumnPhysics
    with pytest.raises(ValueError, match="calc_surface_temperature"):
        ColumnPhysics(5, 7, ktherm=2, calc_tsfc=False)


def test_model_step_with_prescribed_fluxes():
    """A full model step in calc_Tsfc=False mode runs and differs from
    the calc_Tsfc=True trajectory; Tsfc stays at the coupler's value
    wherever ice persists."""
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.config import Config, RunConfig, ColumnConfig
    from seaice_tpu.config import VelocitySolverConfig
    from seaice_tpu.testcases import box
    from seaice_tpu.column.driver import AtmosForcing, OceanForcing

    mesh = box.box_test_mesh(8, 8)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    ncat = 3
    base = Config(
        run=RunConfig(dt=3600.0, n_categories=ncat),
        velocity=VelocitySolverConfig(elastic_subcycle_number=4),
        column=ColumnConfig(ktherm=1))
    off = dataclasses.replace(base, column=dataclasses.replace(
        base.column, calc_surface_temperature=False))

    area, vol, snow = box.box_initial_state(mesh, n_categories=ncat)
    forcing = box.box_forcing(mesh, t=0.0)
    nc = mesh.n_cells
    z = jnp.zeros((nc,), jnp.float64)
    atm = AtmosForcing(
        air_temperature=jnp.full((nc,), 253.0),
        specific_humidity=jnp.full((nc,), 5e-4),
        u_air=jnp.full((nc,), 5.0), v_air=z,
        longwave_down=jnp.full((nc,), 180.0),
        sw_vis_dir=z, sw_vis_dif=z, sw_ir_dir=z, sw_ir_dif=z,
        rain_rate=z, snow_rate=z,
        air_density=jnp.full((nc,), 1.3),
        air_level_height=jnp.full((nc,), 10.0))
    ocn = OceanForcing(
        sst=jnp.full((nc,), -1.8), sss=jnp.full((nc,), 34.0),
        freezing_temperature=jnp.full((nc,), -1.8),
        frzmlt=z, mixed_layer_depth=jnp.full((nc,), 20.0))
    sfcf = {"fsurf": jnp.full((nc, ncat), -25.0),
            "fcondtop": jnp.full((nc, ncat), -20.0),
            "flat": jnp.full((nc, ncat), -4.0),
            "fsens": jnp.full((nc, ncat), -10.0)}

    m_on = SeaIceModel(mesh, base, dtype=jnp.float64)
    s_on = m_on.init_state(area, vol, snow)
    out_on, _ = m_on.make_step()(m_on.tensors, s_on, forcing, atm, ocn)

    m_off = SeaIceModel(mesh, off, dtype=jnp.float64)
    s_off = m_off.init_state(area, vol, snow)
    with pytest.raises(ValueError, match="sfc_fluxes"):
        m_off.make_step(jit=False)(m_off.tensors, s_off, forcing,
                                   atm, ocn)
    out_off, _ = m_off.make_step()(
        m_off.tensors, s_off, forcing, atm, ocn, sfc_fluxes=sfcf)

    t_on = np.asarray(out_on.tracers["surfaceTemperature"])
    t_off = np.asarray(out_off.tracers["surfaceTemperature"])
    a_off = np.asarray(out_off.tracers["iceAreaCategory"])
    a0 = np.asarray(s_off.tracers["iceAreaCategory"])
    t0 = np.asarray(s_off.tracers["surfaceTemperature"])
    # prescribed mode keeps Tsfc fixed through the thermo where ice
    # persists in place
    keep = (a0 > 0.01) & (a_off > 0.01)
    np.testing.assert_allclose(t_off[keep], t0[keep], atol=1e-9)
    # and the two modes genuinely diverge
    assert np.abs(t_on - t_off).max() > 0.01


def test_namelist_maps_calc_surface_temperature():
    from seaice_tpu.namelist import config_from_namelist
    cfg, _setup = config_from_namelist({
        "atmosphere": {"config_calc_surface_temperature": False}})
    assert cfg.column.calc_surface_temperature is False
