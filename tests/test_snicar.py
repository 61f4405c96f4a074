"""SNICAR 5-band shortwave (reference compute_dEdd_5bd,
ice_shortwave.F90:3955-5407)."""

import numpy as np
import jax.numpy as jnp


def _forcing(nb, ncat):
    one = jnp.ones((nb,))
    return dict(swvdr=100.0 * one, swvdf=60.0 * one,
                swidr=110.0 * one, swidf=60.0 * one)


def test_energy_closure_and_ranges():
    from seaice_tpu.column.snicar import shortwave_snicar
    nb = 4
    hi = jnp.array([0.3, 2.5, 1.5, 1.5])[:, None]
    hs = jnp.array([0.0, 0.0, 0.05, 0.4])[:, None]
    aicen = jnp.ones((nb, 1))
    f = _forcing(nb, 1)
    sw = shortwave_snicar(aicen, hi * aicen, hs * aicen,
                          jnp.full((nb, 1), -5.0),
                          jnp.full((nb,), 0.5), **f, n_ice_layers=7)
    incident = sum(f.values())
    absorbed = (sw.fswsfc + sw.fswint + sw.fswthru)[:, 0]
    reflected = (sw.alvdr * f["swvdr"] + sw.alvdf * f["swvdf"] +
                 sw.alidr * f["swidr"] + sw.alidf * f["swidf"])[:, 0]
    np.testing.assert_allclose(np.asarray(absorbed + reflected),
                               incident, rtol=1e-6)
    alb = np.asarray(reflected / incident)
    # thin bare < thick bare < snow-covered; published SNICAR ranges
    assert alb[0] < alb[1] < alb[2] <= alb[3]
    assert 0.1 < alb[0] and 0.7 < alb[3] < 0.95
    np.testing.assert_allclose(
        np.asarray(sw.Iswabs.sum(-1) + sw.Sswabs.sum(-1)),
        np.asarray(sw.fswint), atol=1e-6)


def test_grain_radius_darkens_snow():
    from seaice_tpu.column.snicar import shortwave_snicar
    aicen = jnp.ones((1, 1))
    hi, hs = 1.5 * aicen, 0.3 * aicen
    tsf = jnp.full((1, 1), -10.0)
    f = _forcing(1, 1)
    incident = float(sum(f.values())[0])

    def alb(r):
        sw = shortwave_snicar(aicen, hi, hs, tsf, jnp.full((1,), 0.5),
                              **f, n_ice_layers=7,
                              rsnw=jnp.full((1, 1, 1), r))
        refl = (sw.alvdr * f["swvdr"] + sw.alvdf * f["swvdf"] +
                sw.alidr * f["swidr"] + sw.alidf * f["swidf"])
        return float(refl[0, 0]) / incident

    assert alb(50.0) > alb(400.0) > alb(1500.0)
    assert 0.55 < alb(1500.0) < alb(50.0) < 0.95


def test_snicar_in_driver():
    """use_snicar config flag reaches the radiation dispatch."""
    from seaice_tpu.column import ColumnPhysics
    col = ColumnPhysics(3, 4, shortwave="dEdd", use_snicar=True,
                        use_snow_tracers=True)
    aicen = jnp.full((2, 3), 0.3)
    vicen = aicen * 1.0
    vsnon = aicen * 0.2
    tsfc = jnp.full((2, 3), -5.0)
    tracers = {"snowGrainRadius": jnp.full((2, 3, 1), 120.0)}
    one = jnp.ones((2,))
    sw = col._step_radiation(aicen, vicen, vsnon, tsfc, 0.5 * one,
                             100.0 * one, 60.0 * one, 110.0 * one,
                             60.0 * one, tracers)
    for v in sw:
        assert np.isfinite(np.asarray(v)).all()
    assert float(sw.alvdr.max()) > 0.5      # snow-covered: bright


def test_pond_snow_blend_consistent():
    """final = base + fs*(snow5 - bare3): ponded columns reduce to the
    3-band result when snow-free, and energy still closes with ponds."""
    from seaice_tpu.column.snicar import shortwave_snicar
    from seaice_tpu.column.dedd import shortwave_dedd
    nb = 2
    aicen = jnp.ones((nb, 1))
    hi = 1.5 * aicen
    hs = jnp.array([0.0, 0.2])[:, None]        # col 0 bare+pond
    apnd = jnp.full((nb, 1), 0.4)
    hpnd = jnp.full((nb, 1), 0.15)
    tsf = jnp.full((nb, 1), -2.0)
    f = _forcing(nb, 1)
    sw5 = shortwave_snicar(aicen, hi, hs, tsf, jnp.full((nb,), 0.6),
                           **f, n_ice_layers=7, apnd=apnd, hpnd=hpnd)
    sw3 = shortwave_dedd(aicen, hi, jnp.zeros_like(hs), tsf,
                         jnp.full((nb,), 0.6), **f, n_ice_layers=7,
                         apnd=apnd, hpnd=hpnd)
    # snow-free column: 5-band == 3-band path exactly
    np.testing.assert_allclose(float(sw5.alvdr[0, 0]),
                               float(sw3.alvdr[0, 0]), rtol=1e-12)
    incident = sum(f.values())
    absorbed = (sw5.fswsfc + sw5.fswint + sw5.fswthru)[:, 0]
    reflected = (sw5.alvdr * f["swvdr"] + sw5.alvdf * f["swvdf"] +
                 sw5.alidr * f["swidr"] + sw5.alidf * f["swidf"])[:, 0]
    np.testing.assert_allclose(np.asarray(absorbed + reflected),
                               np.asarray(incident), rtol=1e-6)


class TestAerosolOptics:
    """Bulk aerosol optics in dEdd (reference ice_shortwave.F90
    :2556-2650): absorbing aerosols darken the surface."""

    def _run(self, aero_snow=None, aero_ice=None):
        from seaice_tpu.column.dedd import shortwave_dedd
        nb, ncat, ni, ns = 3, 1, 4, 1
        a = jnp.full((nb, ncat), 0.9)
        vi = jnp.full((nb, ncat), 1.5 * 0.9)
        vs = jnp.full((nb, ncat), 0.25 * 0.9)
        tsfc = jnp.full((nb, ncat), -10.0)
        cz = jnp.full((nb, ncat), 0.6)
        f = jnp.full((nb,), 100.0)
        return shortwave_dedd(a, vi, vs, tsfc, cz, f, f, f, f, ni, ns,
                              aero_mp_snow=aero_snow,
                              aero_mp_ice=aero_ice)

    def test_bc_darkens_snow(self):
        nb, ncat = 3, 1
        clean = self._run()
        # 5e-5 kg/m^2 of black carbon (species 0) in the snow SSL
        mp = np.zeros((nb, ncat, 1, 2))
        mp[..., 0, 0] = 5e-5
        dirty = self._run(aero_snow=jnp.asarray(mp))
        assert float(dirty.alvdr.mean()) < \
            float(clean.alvdr.mean()) - 0.01
        # absorbed+through+reflected still balances: albedos in [0,1]
        for f in (dirty.alvdr, dirty.alidf):
            v = np.asarray(f)
            assert (v >= 0.0).all() and (v <= 1.0).all()

    def test_dust_darkens_less_than_bc(self):
        nb, ncat = 3, 1
        mp_bc = np.zeros((nb, ncat, 3, 2)); mp_bc[..., 0, 0] = 2e-5
        mp_du = np.zeros((nb, ncat, 3, 2)); mp_du[..., 2, 0] = 2e-5
        a_bc = self._run(aero_snow=jnp.asarray(mp_bc))
        a_du = self._run(aero_snow=jnp.asarray(mp_du))
        clean = self._run()
        assert float(a_bc.alvdr.mean()) < \
            float(a_du.alvdr.mean())
        assert float(a_du.alvdr.mean()) <= \
            float(clean.alvdr.mean()) + 1e-12

    def test_ice_aerosol_changes_transmission(self):
        nb, ncat = 3, 1
        mp = np.zeros((nb, ncat, 1, 2))
        mp[..., 0, 1] = 1e-4         # BC in the ice body
        clean = self._run()
        dirty = self._run(aero_ice=jnp.asarray(mp))
        assert float(dirty.fswthru.mean()) < float(clean.fswthru.mean())


def test_snicar_aerosol_darkens_snow():
    """BC in the snow lowers the 5-band SNICAR albedo too."""
    from seaice_tpu.column.snicar import shortwave_snicar
    nb, ncat, ni, ns = 2, 1, 4, 1
    a = jnp.full((nb, ncat), 0.9)
    vi = jnp.full((nb, ncat), 1.5 * 0.9)
    vs = jnp.full((nb, ncat), 0.25 * 0.9)
    tsfc = jnp.full((nb, ncat), -10.0)
    cz = jnp.full((nb, ncat), 0.6)
    f = jnp.full((nb,), 100.0)
    clean = shortwave_snicar(a, vi, vs, tsfc, cz, f, f, f, f, ni, ns)
    mp = np.zeros((nb, ncat, 1, 2))
    mp[..., 0, 0] = 5e-5
    dirty = shortwave_snicar(a, vi, vs, tsfc, cz, f, f, f, f, ni, ns,
                             aero_mp_snow=jnp.asarray(mp))
    assert float(dirty.alvdr.mean()) < float(clean.alvdr.mean()) - 0.01
    for fld in (dirty.alvdr, dirty.alidf):
        v = np.asarray(fld)
        assert (v >= 0.0).all() and (v <= 1.0).all()
