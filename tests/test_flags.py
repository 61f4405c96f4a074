"""Config flags must change the model answer (kills dead flags).

VERDICT round-1 found `ktherm`/`kstrength` and the pond/snow packages
silently ignored; these tests assert every scheme selector actually
alters a full-physics trajectory, mirroring the reference's
Registry-option => behavior contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from seaice_tpu.config import (AdvectionConfig, ColumnConfig, Config,
                               RunConfig, VelocitySolverConfig)
from seaice_tpu.column import (AtmosForcing, OceanForcing,
                               slab_ocean_frzmlt)
from seaice_tpu.column.thermo_shared import (
    salinity_profile, melting_temperature,
    ice_enthalpy_from_temperature, snow_enthalpy_from_temperature)
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box
from seaice_tpu.utils.pytree import replace

NCAT, NI, NS = 2, 4, 1


def _run(col_cfg: ColumnConfig, warm: bool = False, steps: int = 2):
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=NCAT, n_ice_layers=NI),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=2, rotate_cartesian_grid=False,
            include_metric_terms=False, geostrophic_surface_tilt=False),
        advection=AdvectionConfig(),
        column=col_cfg)
    mesh = box.box_test_mesh(6, 6)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)

    nc = mesh.n_cells
    conc = np.clip(mesh.x_cell / box.BOX_LX, 0.05, 1.0)
    area = np.tile((conc / NCAT)[:, None], (1, NCAT)) * 0.9
    h = model.column.hin_max
    mids = 0.5 * (h[:-1] + np.minimum(h[1:], 10.0))
    vol = area * mids
    state = model.init_state(area, vol, area * 0.05)
    S = salinity_profile(NI)
    has = area[..., None] > 0
    tr = dict(state.tracers)
    t0 = -2.0 if warm else -12.0
    tr["surfaceTemperature"] = jnp.asarray(np.where(area > 0, t0, 0.0))
    tr["iceEnthalpy"] = ice_enthalpy_from_temperature(
        jnp.asarray(np.where(has, t0 / 1.5, 0.0) *
                    np.ones((nc, NCAT, NI))),
        melting_temperature(jnp.asarray(np.tile(S, (nc, NCAT, 1))))) * has
    tr["iceSalinity"] = jnp.asarray(np.tile(S, (nc, NCAT, 1))) * has
    tr["snowEnthalpy"] = snow_enthalpy_from_temperature(
        jnp.asarray((t0 - 1.0) * np.ones((nc, NCAT, NS)))) * has
    state = replace(state, tracers=tr)

    forcing = box.box_forcing(mesh, t=0.0)
    one = jnp.ones((nc,), jnp.float64)
    if warm:
        atm = AtmosForcing(
            air_temperature=276.0 * one, specific_humidity=0.003 * one,
            u_air=forcing.u_air_velocity, v_air=forcing.v_air_velocity,
            longwave_down=300.0 * one,
            sw_vis_dir=250.0 * one, sw_vis_dif=100.0 * one,
            sw_ir_dir=200.0 * one, sw_ir_dif=80.0 * one,
            rain_rate=1e-5 * one, snow_rate=0.0 * one,
            air_density=1.3 * one, air_level_height=10.0 * one)
        sst = -0.5 * one
    else:
        atm = AtmosForcing(
            air_temperature=252.0 * one, specific_humidity=0.0004 * one,
            u_air=forcing.u_air_velocity, v_air=forcing.v_air_velocity,
            longwave_down=170.0 * one,
            sw_vis_dir=5.0 * one, sw_vis_dif=5.0 * one,
            sw_ir_dir=4.0 * one, sw_ir_dif=4.0 * one,
            rain_rate=0.0 * one, snow_rate=1e-5 * one,
            air_density=1.3 * one, air_level_height=10.0 * one)
        sst = -1.7 * one
    Tf = -1.8 * one
    ocn = OceanForcing(
        sst=sst, sss=34.0 * one, freezing_temperature=Tf,
        frzmlt=slab_ocean_frzmlt(sst, Tf, 20.0 * one, cfg.run.dt),
        mixed_layer_depth=20.0 * one)

    step = model.make_step()
    coszen = 0.5 * one
    for _ in range(steps):
        state, diags = step(model.tensors, state, forcing, atm, ocn,
                            coszen=coszen)
    return state, diags


def _signature(state):
    tr = state.tracers
    return np.concatenate([
        np.asarray(tr["iceVolumeCategory"]).ravel(),
        np.asarray(tr["surfaceTemperature"]).ravel(),
        np.asarray(state.velocity.u_velocity).ravel(),
    ])


def _assert_differs(a, b, label):
    sa, sb = _signature(a), _signature(b)
    assert np.isfinite(sa).all() and np.isfinite(sb).all(), label
    assert not np.allclose(sa, sb, rtol=1e-12, atol=1e-14), \
        f"flag {label} did not change the model answer (dead flag)"


@pytest.fixture(scope="module")
def base():
    return _run(ColumnConfig())


@pytest.fixture(scope="module")
def base_warm():
    return _run(ColumnConfig(), warm=True)


def test_ktherm_zero_layer_differs(base):
    st, _ = _run(ColumnConfig(ktherm=0))
    _assert_differs(st, base[0], "ktherm=0")


def test_ktherm_mushy_differs(base):
    st, _ = _run(ColumnConfig(ktherm=2))
    _assert_differs(st, base[0], "ktherm=2")
    # mushy evolves the salinity profile; BL99 keeps it fixed
    s_base = np.asarray(base[0].tracers["iceSalinity"])
    s_mushy = np.asarray(st.tracers["iceSalinity"])
    assert not np.allclose(s_base, s_mushy)


def test_kstrength_differs(base):
    st, _ = _run(ColumnConfig(kstrength=0))
    _assert_differs(st, base[0], "kstrength=0")


def test_shortwave_dedd_differs(base):
    st, _ = _run(ColumnConfig(shortwave="dEdd"))
    _assert_differs(st, base[0], "shortwave=dEdd")


def test_form_drag_differs(base):
    st, _ = _run(ColumnConfig(use_form_drag=True, use_level_ice=True))
    _assert_differs(st, base[0], "use_form_drag")


def test_highfreq_differs(base):
    st, _ = _run(ColumnConfig(highfreq=True))
    _assert_differs(st, base[0], "highfreq")


@pytest.mark.parametrize("scheme", ["cesm", "lvl", "topo"])
def test_pond_schemes_make_ponds(scheme, base_warm):
    st, diags = _run(ColumnConfig(pond_scheme=scheme,
                                  shortwave="dEdd"), warm=True)
    _assert_differs(st, base_warm[0], f"pond_scheme={scheme}")
    apnd = np.asarray(st.tracers["pondArea"])
    assert np.isfinite(apnd).all()
    assert apnd.max() > 0.0, f"{scheme} scheme formed no ponds"
    hpnd = np.asarray(st.tracers["pondDepth"])
    assert hpnd.min() >= 0.0 and np.isfinite(hpnd).all()


def test_snow_tracers_with_dedd_differ():
    base = _run(ColumnConfig(shortwave="dEdd"), warm=True)
    st, _ = _run(ColumnConfig(shortwave="dEdd", use_snow_tracers=True),
                 warm=True)
    _assert_differs(st, base[0], "use_snow_tracers")
    r = np.asarray(st.tracers["snowGrainRadius"])
    assert np.isfinite(r).all() and r.min() >= 0.0


def test_level_ice_tracers_track_ridging(base):
    st, diags = _run(ColumnConfig(use_level_ice=True))
    alvl = np.asarray(st.tracers["levelIceArea"])
    assert np.isfinite(alvl).all()
    assert alvl.max() <= 1.0 + 1e-9
    # ridging occurred somewhere -> level fraction below 1 there
    if float(diags["dardg1dt"].max()) > 0.0:
        assert alvl.min() < 1.0 - 1e-9


def test_unsupported_flags_error():
    from seaice_tpu.column import ColumnPhysics
    with pytest.raises(ValueError):
        ColumnPhysics(5, 7, ktherm=3)
    with pytest.raises(ValueError):
        ColumnPhysics(5, 7, kstrength=2)
    with pytest.raises(ValueError):
        ColumnPhysics(5, 7, pond_scheme="bogus")


def test_atmbndy_changes_the_answer(base):
    """atmbndy='constant' (fixed exchange coefficients,
    atmo_boundary_const) must alter the stepped state vs the
    Monin-Obukhov default — kills the dead flag."""
    st, _ = _run(ColumnConfig(atmbndy="constant"))
    _assert_differs(st, base[0], "atmbndy=constant")


def test_package_switches_change_the_answer(base):
    """config_use_column_shortwave / _vertical_thermodynamics /
    _itd_thermodynamics package switches must each alter the stepped
    state (they gated nothing before round 2)."""
    for kw in ({"use_shortwave": False},
               {"use_vertical_thermodynamics": False},
               {"use_itd_thermodynamics": False}):
        st, _ = _run(ColumnConfig(**kw))
        _assert_differs(st, base[0], str(kw))
