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
        r = algal_reactions(
            3600.0, C, jnp.asarray([50.0]), jnp.asarray([-1.8]), p)
        react = np.asarray(r.react)[0]
        grow = r.grow
        assert grow[0] > 0.0
        assert react[1] < 0.0 or react[2] < 0.0    # N source drawn down
        assert react[3] < 0.0                      # silicate uptake
        # silicate uptake in the R_Si2N ratio of total growth
        np.testing.assert_allclose(-react[3],
                                   p.R_Si2N[0] * float(grow[0]) * 3600.0,
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


class TestFullEcosystem:
    """The complete algal_dyn network (reference ice_algae.F90
    :1505-2309): 3 autotroph classes, DOC/DIC/DON, iron, DMS chain."""

    def _params(self):
        from seaice_tpu.column.zbgc import ZbgcParams
        return ZbgcParams(n_algae=3, use_C=True, use_DON=True,
                          use_Fe=True, use_DMS=True, use_PON=True)

    def _state(self, p):
        ix = p.index()
        C = np.zeros((2, p.n_bio))
        C[:, ix["N"]] = [1.0, 0.5, 0.3]
        C[:, ix["Nit"]] = 12.0
        C[:, ix["Am"]] = 1.0
        C[:, ix["Sil"]] = 25.0
        C[:, ix["DOC"]] = [16.2, 9.0]
        C[:, ix["DIC"]] = 1950.0
        C[:, ix["DON"]] = 12.9
        C[:, ix["Fed"]] = 0.4
        C[:, ix["Fep"]] = 2.0
        C[:, ix["DMSPd"]] = 0.1
        C[:, ix["DMS"]] = 0.1
        C[:, ix["PON"]] = 12.0
        return jnp.asarray(C)

    def test_roster_indexing(self):
        p = self._params()
        ix = p.index()
        assert p.n_bio == 3 + 1 + 1 + 1 + 2 + 1 + 1 + 2 + 2 + 1
        assert ix["N"] == slice(0, 3)
        assert len(p.ocean_concentrations()) == p.n_bio

    def test_nitrogen_closure(self):
        """N across {algae, Nit, Am, DON} + Zoo closes to roundoff
        (the reference's Zoo bookkeeping, algal_dyn :2058-2072)."""
        from seaice_tpu.column.zbgc import algal_reactions
        p = self._params()
        C = self._state(p)
        r = algal_reactions(3600.0, C, jnp.full((2,), 40.0),
                            jnp.full((2,), -1.5), p)
        ix = p.index()
        react = np.asarray(r.react)
        dN = (react[:, ix["N"]].sum(-1) + react[:, ix["Nit"]].sum(-1)
              + react[:, ix["Am"]].sum(-1)
              + react[:, ix["DON"]].sum(-1))
        np.testing.assert_allclose(dN + np.asarray(r.zoo), 0.0,
                                   atol=1e-12)

    def test_carbon_closure(self):
        """C across {algae*R_C2N, DOC, DIC, DON*R_C2N_DON} closes
        (the reference's Cerror / conserve_C gate)."""
        from seaice_tpu.column.zbgc import algal_reactions
        p = self._params()
        r = algal_reactions(3600.0, self._state(p),
                            jnp.full((2,), 40.0),
                            jnp.full((2,), -1.5), p)
        assert float(np.abs(np.asarray(r.cerror)).max()) < 1e-10

    def test_dms_chain(self):
        """DMSPd converts to DMS with yield y_sk_DMS; DMS oxidizes."""
        from seaice_tpu.column.zbgc import ZbgcParams, algal_reactions
        p = ZbgcParams(n_algae=1, use_DMS=True, use_C=False,
                       use_DON=False, use_Fe=False)
        ix = p.index()
        C = np.zeros((1, p.n_bio))
        C[:, ix["DMSPd"]] = 10.0
        C[:, ix["DMS"]] = 0.0
        C[:, ix["Nit"]] = 1.0
        r = algal_reactions(86400.0, jnp.asarray(C),
                            jnp.zeros((1,)), jnp.full((1,), -1.8), p)
        react = np.asarray(r.react)[0]
        dDMSPd = react[ix["DMSPd"]][0]
        dDMS = react[ix["DMS"]][0]
        assert dDMSPd < 0.0                         # conversion loss
        np.testing.assert_allclose(dDMS, -p.y_sk_DMS * dDMSPd,
                                   rtol=1e-12)

    def test_iron_limits_phaeocystis(self):
        """High Fe:N demand (R_Fe2N=0.7) makes phaeocystis growth
        iron-limited when dissolved iron is scarce."""
        from seaice_tpu.column.zbgc import algal_reactions
        p = self._params()
        C = self._state(p)
        ix = p.index()
        C_lo = C.at[:, ix["Fed"]].set(1e-4)
        r_hi = algal_reactions(3600.0, C, jnp.full((2,), 40.0),
                               jnp.full((2,), -1.5), p)
        r_lo = algal_reactions(3600.0, C_lo, jnp.full((2,), 40.0),
                               jnp.full((2,), -1.5), p)
        assert float(r_lo.grow[0]) < float(r_hi.grow[0])

    def test_transport_with_full_roster(self):
        """zbgc_transport_react over the 15-tracer roster: finite,
        nonnegative, chla accumulates under light."""
        from seaice_tpu.column.zbgc import zbgc_transport_react
        p = self._params()
        K = 5
        C = jnp.broadcast_to(self._state(p)[:, :, None],
                             (2, p.n_bio, K))
        iphin = jnp.full((2, K), 0.2)
        iDin = jnp.full((2, K), 1e-6)
        zero = jnp.zeros((2,))
        hbr = jnp.full((2,), 1.0)
        out = zbgc_transport_react(
            3600.0, C, iphin, iDin, zero, hbr, hbr, zero,
            jnp.full((2,), 30.0), jnp.full((2,), -1.5),
            p.ocean_concentrations(), p)
        assert np.isfinite(np.asarray(out.tracers)).all()
        assert float(out.tracers.min()) >= 0.0
        assert float(out.chla.max()) > 0.0
        assert float(out.cerror.max()) < 1e-8


class TestFctTransport:
    """Second-order flux-corrected vertical transport (VERDICT round-2
    item 6): the FCT pass must preserve local bounds on steep profiles
    while beating first-order upwind accuracy on smooth advection."""

    def test_fct_monotone_on_step_profile(self):
        """A step profile advected by strong flushing must stay within
        the local bounds (no overshoot/undershoot — the property the
        reference's FCT guarantees, ice_algae.F90:794-1497)."""
        from seaice_tpu.column.zbgc import ZbgcParams, \
            zbgc_transport_react
        p = ZbgcParams(n_algae=1, use_Am=False, use_Sil=False)
        K = 8
        prof = np.zeros(K)
        prof[:K // 2] = 10.0               # sharp step
        C = jnp.asarray(np.tile(prof, (2, p.n_bio, 1)))
        iphin = jnp.full((2, K), 0.3)
        iDin = jnp.zeros((2, K))           # pure advection
        hbr = jnp.full((2,), 1.0)
        zero = jnp.zeros((2,))
        darcy = jnp.full((2,), -2e-5)      # strong flushing
        out = zbgc_transport_react(
            1800.0, C, iphin, iDin, darcy, hbr, hbr, zero,
            jnp.zeros((2,)), jnp.full((2,), -1.8),
            jnp.zeros((p.n_bio,)), p)
        res = np.asarray(out.tracers)
        assert np.isfinite(res).all()
        # bounds: nothing outside [0, 10] (ocean conc is 0 here)
        assert res.min() >= -1e-12
        assert res.max() <= 10.0 + 1e-9

    def test_fct_sharper_than_upwind(self):
        """The limited anti-diffusive correction must reduce the
        smearing of the low-order solution on a smooth profile
        (second-order where smooth) without creating new extrema."""
        from seaice_tpu.column.zbgc import _fct_antidiffusion
        K = 16
        x = np.linspace(0.0, 1.0, K)
        dx = 1.0 / (K - 1)
        dt = 1.0
        w = 0.3 * dx / dt                  # CFL 0.3 downward
        exact0 = np.exp(-((x - 0.35) / 0.12) ** 2)
        # one explicit upwind step as the low-order solution
        low = exact0.copy()
        low[1:] = exact0[1:] - w * dt / dx * (exact0[1:] - exact0[:-1])
        exact = np.exp(-((x - 0.35 - w * dt) / 0.12) ** 2)
        C_old = jnp.asarray(exact0)[None, :]
        C_low = jnp.asarray(low)[None, :]
        out = np.asarray(_fct_antidiffusion(
            C_old, C_low, jnp.asarray([w]), dt, dx))[0]
        err_low = np.abs(low - exact).sum()
        err_fct = np.abs(out - exact).sum()
        assert err_fct < 0.7 * err_low     # clearly less diffusive
        # and still within the local bounds
        assert out.min() >= -1e-12
        assert out.max() <= exact0.max() + 1e-9

    def test_zsal_adaptive_substeps_resolve_stiff_columns(self):
        """Columns with fast drainage take more sub-steps; slow
        columns take one.  The adaptive result must still close the
        salt budget exactly (masking keeps the bookkeeping exact)."""
        from seaice_tpu.column.brine import compute_micro_s_mushy
        from seaice_tpu.column.zsalinity import solve_zsalinity
        from seaice_tpu.column import constants as c
        nb, ncat, nbl = 2, 1, 7
        q, S = _profiles(nb, ncat, 7)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.0)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        bS = jnp.full((nb, ncat, nbl), 6.0)
        zero = jnp.zeros((nb, ncat))
        dt = 3600.0
        # strong Darcy flushing in column 0 only
        darcy = jnp.asarray([[-5e-5], [0.0]])
        zs = solve_zsalinity(dt, bS, ms.iphin, ms.iDin, darcy, hbr,
                             hbr, zero, zero, sss,
                             ms.brine_sal[..., -1])
        assert np.isfinite(np.asarray(zs.bSin)).all()
        salt0 = (np.asarray(bS).mean(-1) * np.asarray(hbr) *
                 c.RHOI * 1.0e-3)
        np.testing.assert_allclose(
            np.asarray(zs.zsal_tot) - salt0,
            -np.asarray(zs.fzsal) * dt, rtol=1e-9, atol=1e-12)


class TestZsalConservation:
    def test_salt_budget_closes_and_drainage_split(self):
        """Column salt change == -fzsal*dt (check_conserve_salt
        analog, ice_zsalinity.F90:1029); the gravity-drainage
        component is a subset of the total ocean exchange."""
        from seaice_tpu.column.brine import compute_micro_s_mushy
        from seaice_tpu.column.zsalinity import solve_zsalinity
        nb, ncat, nbl = 2, 1, 7
        q, S = _profiles(nb, ncat, 7)
        sss = jnp.full((nb, ncat), 34.0)
        sst = jnp.full((nb, ncat), -1.7)
        hbr = jnp.full((nb, ncat), 1.0)
        ms = compute_micro_s_mushy(q, S, sss, sst, hbr, nbl)
        bS = jnp.full((nb, ncat, nbl), 6.0)
        zero = jnp.zeros((nb, ncat))
        dt = 3600.0
        zs = solve_zsalinity(dt, bS, ms.iphin, ms.iDin, zero, hbr,
                             hbr, zero, zero, sss,
                             ms.brine_sal[..., -1])
        from seaice_tpu.column import constants as c
        salt0 = float((np.asarray(bS) / nbl).sum(-1).mean() *
                      1.0 * c.RHOI * 1.0e-3)
        salt0 = (np.asarray(bS).mean(-1) * np.asarray(hbr) *
                 c.RHOI * 1.0e-3)
        salt1 = np.asarray(zs.zsal_tot)
        np.testing.assert_allclose(
            salt1 - salt0, -np.asarray(zs.fzsal) * dt,
            rtol=1e-9, atol=1e-12)
        # ice saltier than the 6 ppt start: drainage pulls salt IN
        # from the 34 ppt ocean -> fzsal_g negative, and it is part
        # of (not larger than) the total exchange magnitude
        fg = np.asarray(zs.fzsal_g)
        ft = np.asarray(zs.fzsal)
        assert (fg <= 0.0).all()
        assert (np.abs(fg) <= np.abs(ft) + 1e-12).all()


class TestSkeletalAndMobility:
    def _run_model(self, colcfg_kwargs, steps=2):
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
            column=ColumnConfig(ktherm=2, n_bio_layers=4,
                                **colcfg_kwargs))
        mesh = box.box_test_mesh(5, 5)
        mesh.f_vertex = box.box_coriolis_parameter(mesh)
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
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
        diags = None
        for _ in range(steps):
            state, diags = step(model.tensors, state, forcing, atm_j,
                                ocn_j, coszen=jnp.asarray(coszen))
        return model, state, diags

    def test_skeletal_bgc_reachable_from_model_step(self):
        """config_use_skeletal_biochemistry dispatches the skeletal
        scheme (reference ice_algae.F90 skl mode): the sklBgc pools
        exist, evolve, and stay finite/nonnegative."""
        model, state, diags = self._run_model(
            dict(use_skeletal_biochemistry=True))
        assert "sklBgc" in model.tree.names
        s = np.asarray(state.tracers["sklBgc"])
        a = np.asarray(state.tracers["iceAreaCategory"])
        assert np.isfinite(s).all()
        assert s.min() >= 0.0
        # icy cells carry a live skeletal population
        assert (s[..., 0][a > 1e-6] > 0.0).all()
        bgc = diags["column_fluxes"].bgc
        assert "skl_pp" in bgc and "skl_chla" in bgc

    def test_skl_and_z_bgc_mutually_exclusive(self):
        from seaice_tpu.column.driver import ColumnPhysics
        with pytest.raises(ValueError):
            ColumnPhysics(2, 4, use_biogeochemistry=True,
                          use_skeletal_bgc=True)

    def test_mobile_fraction_partitions_and_conserves(self):
        """The zbgc_frac analog: with partitioning engaged the mobile
        fraction drops below 1 under retention, nitrogen closure still
        holds, and changing a mobility type changes the answer."""
        import dataclasses as dc
        from seaice_tpu.column.zbgc import (ZbgcParams,
                                            zbgc_transport_react)
        p = ZbgcParams(n_algae=1)
        rng = np.random.default_rng(0)
        B, K = 6, 5
        nb = p.n_bio
        C = jnp.asarray(rng.uniform(0.5, 4.0, (B, nb, K)))
        iphin = jnp.full((B, K), 0.3)
        iDin = jnp.full((B, K), 1.0e-9)
        darcy = jnp.zeros((B,))
        hbr = jnp.full((B,), 1.0)
        hbr_old = jnp.full((B,), 0.98)     # growing -> retention
        dh_bot = jnp.full((B,), 0.02)
        fsw = jnp.full((B,), 5.0)
        Tbot = jnp.full((B,), -1.8)
        ocean = p.ocean_concentrations(jnp.float64)
        frac = jnp.ones((B, nb))

        r = zbgc_transport_react(1800.0, C, iphin, iDin, darcy, hbr,
                                 hbr_old, dh_bot, fsw, Tbot, ocean, p,
                                 frac=frac)
        assert r.frac_new is not None
        f = np.asarray(r.frac_new)
        assert np.isfinite(f).all() and (f >= 0).all() and (f <= 1).all()
        types = p.tracer_types()
        # retained tracers (type >= 0) lose mobile share; purely
        # mobile tracers (type < 0, e.g. nitrate) stay fully mobile
        assert (f[:, types >= 0] < 1.0).all()
        assert np.allclose(f[:, types < 0], 1.0)

        # a different mobility type changes the evolution
        p2 = dc.replace(p, mobility_type_ammonium=2.0)
        r2 = zbgc_transport_react(1800.0, C, iphin, iDin, darcy, hbr,
                                  hbr_old, dh_bot, fsw, Tbot, ocean,
                                  p2, frac=frac)
        ix = p.index()["Am"].start
        assert not np.allclose(np.asarray(r2.frac_new)[:, ix],
                               f[:, ix])

    def test_mobility_partitioning_in_model(self):
        """bioMobileFraction tracer exists, initializes to 1, and
        departs from 1 through the model step."""
        model, state, _ = self._run_model(
            dict(use_biogeochemistry=True))
        assert "bioMobileFraction" in model.tree.names
        f = np.asarray(state.tracers["bioMobileFraction"])
        a = np.asarray(state.tracers["iceAreaCategory"])
        assert np.isfinite(f).all()
        assert (f >= 0).all() and (f <= 1.0 + 1e-12).all()
        # retention moved some mass to the stationary phase somewhere
        assert (f[a > 1e-6] < 1.0).any()
