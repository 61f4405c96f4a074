"""z-layer (bio-grid) aerosols (config_use_zaerosols; reference
ice_colpkg_tracers.F90:112 'non-reacting layer aerosols', deposition /
brine transport via the zbgc machinery, shortwave coupling via the
dEdd zbio path ice_shortwave.F90:2432-2470)."""

import numpy as np
import jax
import jax.numpy as jnp

from seaice_tpu.column.zbgc import ZbgcParams


def test_roster_appends_zaero_slots():
    p0 = ZbgcParams(n_algae=1)
    pz = ZbgcParams(n_algae=1, use_zaero=True, n_zaero=3)
    assert pz.n_bio == p0.n_bio + 3
    zsl = pz.index()["zaero"]
    assert zsl.stop - zsl.start == 3
    assert zsl.stop == pz.n_bio         # zaero is the last group
    # mobility types come from the BC1/BC2/dust options
    pz2 = ZbgcParams(n_algae=1, use_zaero=True, n_zaero=3,
                     mobility_type_black_carbon1=0.5,
                     mobility_type_dust1=-1.0)
    t = pz2.tracer_types()
    assert t[zsl][0] == 0.5 and t[zsl][2] == -1.0
    # ocean is a sink: zero far-field concentration
    assert float(pz.ocean_concentrations()[zsl].sum()) == 0.0


def test_zaero_is_passive_in_the_reaction_network():
    """Aerosol slots get exactly zero reaction; the bio network is
    unchanged by their presence."""
    from seaice_tpu.column.zbgc import algal_reactions
    p0 = ZbgcParams(n_algae=1)
    pz = ZbgcParams(n_algae=1, use_zaero=True, n_zaero=2)
    nb = 4
    rng = np.random.default_rng(0)
    C0 = jnp.asarray(rng.uniform(0.1, 2.0, (nb, p0.n_bio)))
    Cz = jnp.concatenate(
        [C0, jnp.asarray(rng.uniform(0.0, 1e-5, (nb, 2)))], axis=-1)
    fsw = jnp.full((nb,), 20.0)
    Tb = jnp.full((nb,), -1.8)
    r0 = algal_reactions(3600.0, C0, fsw, Tb, p0)
    rz = algal_reactions(3600.0, Cz, fsw, Tb, pz)
    np.testing.assert_allclose(np.asarray(rz.react[..., :p0.n_bio]),
                               np.asarray(r0.react), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(rz.react[..., p0.n_bio:]),
                                  0.0)


def _zaero_model(n_aerosols=0):
    from seaice_tpu.config import (AdvectionConfig, ColumnConfig,
                                   Config, RunConfig,
                                   VelocitySolverConfig)
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box
    pz = ZbgcParams(n_algae=1, use_zaero=True, n_zaero=3)
    cfg = Config(
        run=RunConfig(dt=1800.0, n_categories=2, n_ice_layers=4),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=2, rotate_cartesian_grid=False,
            include_metric_terms=False,
            geostrophic_surface_tilt=False),
        advection=AdvectionConfig(),
        column=ColumnConfig(ktherm=2, use_biogeochemistry=True,
                            n_bio_layers=4, n_aerosols=n_aerosols,
                            shortwave="dEdd", zbgc_params=pz))
    mesh = box.box_test_mesh(5, 5)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    return model, mesh, cfg, pz


def test_zaero_deposition_accumulates_in_the_ice():
    """faero_atm deposition builds up z-aerosol content; without
    deposition the slots stay empty."""
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.testcases import box
    from seaice_tpu.utils.pytree import replace

    model, mesh, cfg, pz = _zaero_model()
    nbl1 = cfg.column.n_bio_layers + 1
    zsl = pz.index()["zaero"]
    (area, vol, snow, extra, atm, ocn,
     coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
    state0 = model.init_state(area, vol, snow)
    tr = dict(state0.tracers)
    tr.update({k: jnp.asarray(v) for k, v in extra.items()})
    state0 = replace(state0, tracers=tr)
    forcing = box.box_forcing(mesh, t=0.0)
    atm_j = jax.tree.map(jnp.asarray, atm)
    ocn_j = jax.tree.map(jnp.asarray, ocn)
    step = model.make_step()
    dep = jnp.full((mesh.n_cells, 3), 1e-9)   # kg/m^2/s

    def run(faero):
        s = state0
        for _ in range(3):
            s, d = step(model.tensors, s, forcing, atm_j, ocn_j,
                        coszen=jnp.asarray(coszen), faero_atm=faero)
        bio = np.asarray(s.tracers["bioTracers"])
        shape = bio.shape[:-1] + (pz.n_bio, nbl1)
        return bio.reshape(shape)[..., zsl, :], s

    with_dep, s_dep = run(dep)
    without, _ = run(None)
    a = np.asarray(s_dep.tracers["iceAreaCategory"])
    has = a > 0.01
    assert np.isfinite(with_dep).all()
    assert with_dep[has].max() > 0.0
    assert without[has].max() == 0.0
    # biology is untouched by aerosol deposition
    bio_d, _ = run(dep)


def test_zaero_darkens_the_dedd_albedo():
    """z-aerosol mass in the bio grid lowers the dEdd albedo through
    the zbio mass-path coupling."""
    from seaice_tpu.parallel.sharded import full_physics_inputs
    from seaice_tpu.testcases import box
    from seaice_tpu.utils.pytree import replace

    model, mesh, cfg, pz = _zaero_model()
    nbl1 = cfg.column.n_bio_layers + 1
    zsl = pz.index()["zaero"]
    (area, vol, snow, extra, atm, ocn,
     coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
    # remove the snow so the ice-layer aerosol dominates the albedo
    snow = np.zeros_like(snow)
    state = model.init_state(area, vol, snow)
    tr = dict(state.tracers)
    tr.update({k: jnp.asarray(v) for k, v in extra.items()})
    tr["snowVolumeCategory"] = jnp.zeros_like(tr["snowVolumeCategory"])

    def albedo(load):
        bio = tr["bioTracers"]
        shape = bio.shape[:-1] + (pz.n_bio, nbl1)
        Cb = jnp.zeros(shape, bio.dtype)
        Cb = Cb.at[..., zsl, :].set(load)
        tr2 = dict(tr)
        tr2["bioTracers"] = Cb.reshape(bio.shape)
        s = replace(state, tracers=tr2)
        step = model.make_step()
        _, d = step(model.tensors, s, box.box_forcing(mesh, t=0.0),
                    jax.tree.map(jnp.asarray, atm),
                    jax.tree.map(jnp.asarray, ocn),
                    coszen=jnp.asarray(coszen))
        fl = d["column_fluxes"]
        return float(np.asarray(fl.albedo_vis_dir).mean())

    clean = albedo(0.0)
    dirty = albedo(5e-4)     # kg/m^3-brine BC loading
    assert dirty < clean, (dirty, clean)


def test_namelist_maps_zaerosols():
    from seaice_tpu.namelist import config_from_namelist
    cfg, _ = config_from_namelist({
        "biogeochemistry": {"config_use_zaerosols": True,
                            "config_use_column_biogeochemistry": True}})
    assert cfg.column.zbgc_params.use_zaero is True


def test_bulk_and_z_aerosols_are_exclusive():
    import pytest
    from seaice_tpu.column import ColumnPhysics
    pz = ZbgcParams(n_algae=1, use_zaero=True)
    with pytest.raises(ValueError, match="exclusive"):
        ColumnPhysics(2, 4, n_aerosols=2, use_biogeochemistry=True,
                      use_brine_height=True, zbgc_params=pz)
