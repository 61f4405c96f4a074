"""Brine height + vertical salinity + zBGC (reference ice_brine.F90,
ice_zsalinity.F90, ice_algae.F90/ice_zbgc.F90)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seaice_tpu.column.thermo_shared import salinity_profile


def _profiles(nb=3, ncat=2, ni=7):
    from seaice_tpu.column.mushy import enthalpy_mush
    S = jnp.asarray(np.tile(salinity_profile(ni), (nb, ncat, 1)))
    T = jnp.full((nb, ncat, ni), -5.0)
    q = enthalpy_mush(T, S)
    return q, S


class TestBrine:
    def test_micro_structure(self):
        from seaice_tpu.column.brine import compute_micro_s_mushy
        nb, ncat, ni, nbl = 3, 2, 7, 7
        q, S = _profiles(nb, ncat, ni)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.2)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        # porosity in (0, 1]; warmer/saltier bottom -> more porous
        assert float(ms.bphin.min()) > 0.0
        assert float(ms.bphin.max()) <= 1.0
        assert float(ms.iphin[..., -1].min()) >= \
            float(ms.iphin[..., 1].max()) - 0.5
        # permeability positive and small
        assert 0.0 < float(ms.kperm.min()) < 1e-6
        # diffusivity nonnegative, zero flux at the top interface
        assert float(ms.iDin.min()) >= 0.0
        np.testing.assert_allclose(np.asarray(ms.iDin[..., 0]), 0.0)
        # mean ice density between pure ice and seawater-logged mush
        assert 850.0 < float(ms.sice_rho.mean()) < 1020.0

    def test_update_hbrine_relaxes_to_sea_level(self):
        from seaice_tpu.column.brine import RHOSI, update_hbrine
        nb = 4
        one = jnp.ones((nb,))
        hin = 1.5 * one
        hsn = 0.0 * one
        h_ocn = RHOSI / 1026.0 * 1.5
        # brine well above sea level must drain toward it
        hbr_old = (h_ocn + 0.3) * one
        r = update_hbrine(3600.0, 0.0 * one, 0.0 * one, 0.0 * one,
                          hin, hsn, hin, hbr_old, 0.0 * one,
                          0.0 * one, 2e-10 * one, 0.2 * one,
                          0.1 * one)
        assert float(r.hbr.max()) < float(hbr_old[0])
        assert float(r.hbr.min()) > h_ocn - 1e-6
        assert np.isfinite(np.asarray(r.fbri)).all()
        # brine below sea level floods upward
        hbr_lo = (h_ocn - 0.2) * one
        r2 = update_hbrine(3600.0, 0.0 * one, 0.0 * one, 0.0 * one,
                           hin, hsn, hin, hbr_lo, 0.0 * one,
                           0.0 * one, 2e-10 * one, 0.2 * one,
                           0.1 * one)
        assert float(r2.hbr.min()) > float(hbr_lo[0])

    def test_preflushing(self):
        from seaice_tpu.column.brine import preflushing_changes
        nb = 2
        one = jnp.ones((nb,))
        pf = preflushing_changes(
            0.9 * one, 1.35 * one, 0.09 * one,
            meltb=0.01 * one, meltt=0.005 * one, congel=0.02 * one,
            snoice=0.0 * one, hice_old=1.495 * one, fbri=one)
        np.testing.assert_allclose(np.asarray(pf.hin), 1.5)
        np.testing.assert_allclose(np.asarray(pf.dhbr_bot), 0.01)
        np.testing.assert_allclose(np.asarray(pf.hbr_old), 1.495)


class TestZsalinity:
    def test_salinity_drains_toward_profile(self):
        from seaice_tpu.column.brine import compute_micro_s_mushy
        from seaice_tpu.column.zsalinity import solve_zsalinity
        nb, ncat, ni, nbl = 2, 1, 7, 7
        q, S = _profiles(nb, ncat, ni)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.0)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        bS = jnp.full((nb, ncat, nbl), 10.0)
        zero = jnp.zeros((nb, ncat))
        zs = solve_zsalinity(3600.0, bS, ms.iphin, ms.iDin,
                             zero, hbr, hbr, zero, zero, sss,
                             ms.brine_sal[..., -1])
        out = np.asarray(zs.bSin)
        assert np.isfinite(out).all()
        assert out.min() >= 0.1 - 1e-12
        # bottom layer exchanges with the saltier ocean
        assert out[..., -1].mean() > 10.0
        assert np.isfinite(np.asarray(zs.fzsal)).all()

    def test_growth_entrains_salt(self):
        from seaice_tpu.column.brine import compute_micro_s_mushy
        from seaice_tpu.column.zsalinity import solve_zsalinity
        nb, ncat, ni, nbl = 1, 1, 7, 7
        q, S = _profiles(nb, ncat, ni)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.0)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        bS = jnp.full((nb, ncat, nbl), 6.0)
        zero = jnp.zeros((nb, ncat))
        grow = jnp.full((nb, ncat), 0.02)      # 2 cm growth
        z_g = solve_zsalinity(3600.0, bS, ms.iphin, ms.iDin, zero,
                              hbr + grow, hbr, grow, zero, sss,
                              ms.brine_sal[..., -1])
        z_0 = solve_zsalinity(3600.0, bS, ms.iphin, ms.iDin, zero,
                              hbr, hbr, zero, zero, sss,
                              ms.brine_sal[..., -1])
        assert float(z_g.zsal_tot[0, 0]) > float(z_0.zsal_tot[0, 0])


class TestZbgc:
    def _setup(self, nb=2, ncat=1, nbl=7):
        from seaice_tpu.column.brine import compute_micro_s_mushy
        from seaice_tpu.column.zbgc import ZbgcParams
        q, S = _profiles(nb, ncat, 7)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.0)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        p = ZbgcParams()
        C = jnp.broadcast_to(
            p.ocean_concentrations()[:, None],
            (nb, ncat, p.n_bio, nbl + 1))
        return ms, p, C, hbr

    def test_growth_under_light(self):
        from seaice_tpu.column.zbgc import zbgc_transport_react
        ms, p, C, hbr = self._setup()
        zero = jnp.zeros(hbr.shape)
        Tb = jnp.full(hbr.shape, -1.8)
        out = zbgc_transport_react(
            3600.0, C, ms.iphin, ms.iDin, zero, hbr, hbr, zero,
            jnp.full(hbr.shape, 20.0), Tb,
            p.ocean_concentrations(), p)
        assert np.isfinite(np.asarray(out.tracers)).all()
        assert float(out.tracers.min()) >= 0.0
        assert float(out.pp_net.max()) > 0.0      # light -> growth
        assert float(out.chla.max()) > 0.0
        # dark: no growth
        dark = zbgc_transport_react(
            3600.0, C, ms.iphin, ms.iDin, zero, hbr, hbr, zero,
            jnp.zeros(hbr.shape), Tb, p.ocean_concentrations(), p)
        assert float(dark.pp_net.max()) <= 1e-12

    def test_nutrient_drawdown_and_uptake_ratio(self):
        from seaice_tpu.column.zbgc import ZbgcParams, algal_reactions
        p = ZbgcParams()
        C = jnp.asarray([[1.0, 12.0, 1.0, 25.0]])   # N, Nit, Am, Sil
        react, grow, uNO, uNH = algal_reactions(
            3600.0, C, jnp.asarray([50.0]), jnp.asarray([-1.8]), p)
        react = np.asarray(react)[0]
        assert grow[0] > 0.0
        assert react[1] < 0.0 or react[2] < 0.0    # N source drawn down
        assert react[3] < 0.0                      # silicate uptake
        # silicate uptake in the R_Si2N ratio of total growth
        np.testing.assert_allclose(-react[3],
                                   p.R_Si2N * float(grow[0]) * 3600.0,
                                   rtol=1e-6)

    def test_full_model_with_bgc(self):
        """use_biogeochemistry through the model step: tracers stay
        finite, chlorophyll develops, brine height tracked."""
        from seaice_tpu.config import (AdvectionConfig, ColumnConfig,
                                       Config, RunConfig,
                                       VelocitySolverConfig)
        from seaice_tpu.parallel.sharded import full_physics_inputs
        from seaice_tpu.model import SeaIceModel
        from seaice_tpu.testcases import box
        from seaice_tpu.utils.pytree import replace

        cfg = Config(
            run=RunConfig(dt=1800.0, n_categories=2, n_ice_layers=4),
            velocity=VelocitySolverConfig(
                elastic_subcycle_number=2, rotate_cartesian_grid=False,
                include_metric_terms=False,
                geostrophic_surface_tilt=False),
            advection=AdvectionConfig(),
            column=ColumnConfig(ktherm=2, use_biogeochemistry=True,
                                n_bio_layers=4))
        mesh = box.box_test_mesh(5, 5)
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        assert "brineHeight" in model.tree.names
        assert "bioTracers" in model.tree.names
        (area, vol, snow, extra, atm, ocn,
         coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
        state = model.init_state(area, vol, snow)
        tr = dict(state.tracers)
        tr.update({k: jnp.asarray(v) for k, v in extra.items()})
        state = replace(state, tracers=tr)
        forcing = box.box_forcing(mesh, t=0.0)
        atm_j = jax.tree.map(jnp.asarray, atm)
        ocn_j = jax.tree.map(jnp.asarray, ocn)
        step = model.make_step()
        for _ in range(2):
            state, diags = step(model.tensors, state, forcing, atm_j,
                                ocn_j, coszen=jnp.asarray(coszen))
        for name in ("brineHeight", "bioTracers"):
            v = np.asarray(state.tracers[name])
            assert np.isfinite(v).all(), name
        assert np.asarray(state.tracers["bioTracers"]).min() >= 0.0
        fb = np.asarray(state.tracers["brineHeight"])
        a = np.asarray(state.tracers["iceAreaCategory"])
        assert (fb[a > 1e-6] > 0.0).all()
        bgc = diags["column_fluxes"].bgc
        assert bgc is not None and "chla" in bgc
        assert np.isfinite(np.asarray(bgc["chla"])).all()

    def test_zsalinity_in_model(self):
        """solve_zsalinity with BL99: prognostic salinity transported
        and finite."""
        from seaice_tpu.config import (AdvectionConfig, ColumnConfig,
                                       Config, RunConfig,
                                       VelocitySolverConfig)
        from seaice_tpu.parallel.sharded import full_physics_inputs
        from seaice_tpu.model import SeaIceModel
        from seaice_tpu.testcases import box
        from seaice_tpu.utils.pytree import replace

        cfg = Config(
            run=RunConfig(dt=1800.0, n_categories=2, n_ice_layers=4),
            velocity=VelocitySolverConfig(
                elastic_subcycle_number=2, rotate_cartesian_grid=False,
                include_metric_terms=False,
                geostrophic_surface_tilt=False),
            advection=AdvectionConfig(),
            column=ColumnConfig(ktherm=1, solve_zsalinity=True,
                                n_bio_layers=4))
        mesh = box.box_test_mesh(5, 5)
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        assert "verticalSalinity" in model.tree.names
        (area, vol, snow, extra, atm, ocn,
         coszen) = full_physics_inputs(mesh, cfg, jnp.float64)
        state = model.init_state(area, vol, snow)
        tr = dict(state.tracers)
        tr.update({k: jnp.asarray(v) for k, v in extra.items()})
        state = replace(state, tracers=tr)
        forcing = box.box_forcing(mesh, t=0.0)
        step = model.make_step()
        state, diags = step(model.tensors, state, forcing,
                            jax.tree.map(jnp.asarray, atm),
                            jax.tree.map(jnp.asarray, ocn),
                            coszen=jnp.asarray(coszen))
        vs = np.asarray(state.tracers["verticalSalinity"])
        assert np.isfinite(vs).all()
        assert vs.min() >= 0.1 - 1e-12
