"""Modal (SNICAR internal-mixing) BC aerosol optics in the dEdd
shortwave (config_use_modal_aerosols; reference
ice_shortwave.F90:2390-2470 index computation + :2556-2680 mixing)."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_snow_grain_index_matches_reference_mapping():
    from seaice_tpu.column.dedd import _snow_grain_bcenh_index
    # reference: <125: nint(r/50); <175: 2; else nint(r/250+2),
    # clipped to 1..8 (returned 0-based here)
    cases = {30.0: 1, 60.0: 1, 80.0: 2, 110.0: 2, 130.0: 2,
             170.0: 2, 200.0: 3, 500.0: 4, 1000.0: 6, 1500.0: 8,
             2000.0: 8}
    for r, want_1based in cases.items():
        got = int(_snow_grain_bcenh_index(jnp.asarray(r))) + 1
        assert got == want_1based, (r, got, want_1based)


def _sw_args(nb=3, ncat=2):
    one = jnp.ones((nb, ncat))
    return dict(
        aicen=0.9 * one, vicen=1.5 * one, vsnon=0.25 * one,
        Tsfcn=-5.0 * one, coszen=jnp.full((nb,), 0.5),
        swvdr=100.0 * jnp.ones((nb,)), swvdf=80.0 * jnp.ones((nb,)),
        swidr=90.0 * jnp.ones((nb,)), swidf=60.0 * jnp.ones((nb,)),
        n_ice_layers=7)


def test_modal_aero_darkens_more_for_within_grain_bc():
    """Within-grain BC mass must absorb MORE under the modal
    treatment (bcenh > 1 enhancement) than under the bulk tables,
    and the flag must change the answer."""
    from seaice_tpu.column.dedd import shortwave_dedd
    args = _sw_args()
    nb, ncat = args["aicen"].shape
    # all mass in the within-grain BC species (index 1), snow pools
    mp = np.zeros((nb, ncat, 2, 2))
    mp[..., 1, 0] = 5e-6      # within-grain BC, snow SSL pool (kg/m^2)
    mp[..., 1, 1] = 5e-6      # body pool
    aero_snow = jnp.asarray(mp)
    aero_ice = jnp.zeros_like(aero_snow)

    modal = shortwave_dedd(**args, aero_mp_snow=aero_snow,
                           aero_mp_ice=aero_ice, modal_aero=True)
    bulk = shortwave_dedd(**args, aero_mp_snow=aero_snow,
                          aero_mp_ice=aero_ice, modal_aero=False)
    r_modal = np.asarray(
        modal.alvdr * args["swvdr"][:, None] +
        modal.alvdf * args["swvdf"][:, None] +
        modal.alidr * args["swidr"][:, None] +
        modal.alidf * args["swidf"][:, None]).sum()
    r_bulk = np.asarray(
        bulk.alvdr * args["swvdr"][:, None] +
        bulk.alvdf * args["swvdf"][:, None] +
        bulk.alidr * args["swidr"][:, None] +
        bulk.alidf * args["swidf"][:, None]).sum()
    assert r_modal < r_bulk, (r_modal, r_bulk)
    # energy closure still holds in modal mode
    inc = (args["swvdr"] + args["swvdf"] + args["swidr"] +
           args["swidf"])[:, None]
    absorbed = np.asarray(modal.fswsfc + modal.fswint + modal.fswthru)
    refl = np.asarray(
        modal.alvdr * args["swvdr"][:, None] +
        modal.alvdf * args["swvdf"][:, None] +
        modal.alidr * args["swidr"][:, None] +
        modal.alidf * args["swidf"][:, None])
    np.testing.assert_allclose(absorbed + refl, np.asarray(inc)
                               * np.ones_like(refl), rtol=1e-5)


def test_modal_requires_dedd_and_two_species():
    from seaice_tpu.column import ColumnPhysics
    with pytest.raises(ValueError, match="dEdd"):
        ColumnPhysics(3, 7, shortwave="ccsm3", n_aerosols=2,
                      use_modal_aerosols=True)
    with pytest.raises(ValueError, match="species"):
        ColumnPhysics(3, 7, shortwave="dEdd", n_aerosols=1,
                      use_modal_aerosols=True)


def test_namelist_maps_modal_aerosols():
    from seaice_tpu.namelist import config_from_namelist
    cfg, _ = config_from_namelist({
        "biogeochemistry": {"config_use_modal_aerosols": True},
        "shortwave": {"config_shortwave_type": "dEdd"},
        "aerosols": {"config_use_aerosols": True}})
    assert cfg.column.use_modal_aerosols is True
