"""Namelist-driven configuration + Registry option audit.

Cross-checks `seaice_tpu.namelist.REGISTRY` option-by-option against the
reference's `/root/reference/src/Registry.xml` (316 options in 25
nml_records) and exercises the file-driven Config construction path
(the analog of the reference's namelist read + `setup_packages`,
`mpas_seaice_core_interface.F:85-187`).
"""

import os
import xml.etree.ElementTree as ET

import pytest

from seaice_tpu.config import (AdvectionType, Config, ConstitutiveRelation,
                               StrainScheme)
from seaice_tpu.namelist import (NamelistError, REGISTRY, RunSetup,
                                 audit_summary, config_from_namelist,
                                 parse_namelist, _parse_value, _norm)

REF_REGISTRY = "/root/reference/src/Registry.xml"


def _reference_options():
    tree = ET.parse(REF_REGISTRY)
    out = {}
    for rec in tree.getroot().findall(".//nml_record"):
        for o in rec.findall("nml_option"):
            out[o.get("name")] = (rec.get("name"),
                                  _parse_value(o.get("default_value")))
    return out


@pytest.mark.skipif(not os.path.exists(REF_REGISTRY),
                    reason="reference Registry.xml not available")
def test_audit_covers_every_reference_option():
    ref = _reference_options()
    missing = sorted(set(ref) - set(REGISTRY))
    extra = sorted(set(REGISTRY) - set(ref))
    assert not missing, f"options missing from audit: {missing}"
    assert not extra, f"audit options not in the reference: {extra}"
    for name, (record, default) in ref.items():
        opt = REGISTRY[name]
        assert opt.record == record, (name, opt.record, record)
        assert _norm(opt.default) == _norm(default), \
            (name, opt.default, default)


@pytest.mark.skipif(not os.path.exists(REF_REGISTRY),
                    reason="reference Registry.xml not available")
def test_reference_default_namelist_builds():
    """A namelist with EVERY option at its Registry default must build
    a Config: defaults are always accepted, whatever the disposition."""
    ref = _reference_options()
    records = {}
    for name, (record, default) in ref.items():
        records.setdefault(record, {})[name] = default
    cfg, setup = config_from_namelist(records)
    assert isinstance(cfg, Config)
    # reference defaults: mushy, Rothrock, lvl ponds, dEdd
    assert cfg.column.ktherm == 2
    assert cfg.column.kstrength == 1
    assert cfg.column.pond_scheme == "lvl"
    assert cfg.column.shortwave == "dEdd"
    assert cfg.velocity.elastic_subcycle_number == 120
    assert setup.use_ocean_mixed_layer


def test_parse_namelist_syntax():
    nml = parse_namelist("""
&seaice_model
    config_dt = 1800.0
    config_calendar_type = 'gregorian_noleap'  ! comment
/
&velocity_solver
    config_elastic_subcycle_number = 60,
    config_use_air_stress = .false.
    config_slow = 5.0d-8
/
""")
    assert nml["seaice_model"]["config_dt"] == 1800.0
    assert nml["velocity_solver"]["config_elastic_subcycle_number"] == 60
    assert nml["velocity_solver"]["config_use_air_stress"] is False
    assert nml["velocity_solver"]["config_slow"] == 5.0e-8


def test_config_from_namelist_supported_options():
    cfg, setup = config_from_namelist("""
&seaice_model
    config_dt = 1800.0
/
&velocity_solver
    config_elastic_subcycle_number = 240
    config_strain_scheme = 'variational'
    config_constitutive_relation_type = 'revised_evp'
/
&thermodynamics
    config_thermodynamics_type = 'BL99'
/
&ridging
    config_ice_strength_formulation = 'Hibler79'
    config_ridiging_efolding_scale = 3.0
/
&column_tracers
    config_use_level_meltponds = .false.
    config_use_topo_meltponds = .true.
    config_use_level_ice = .false.
    config_use_ice_age = .false.
    config_use_first_year_ice = .false.
/
&shortwave
    config_shortwave_type = 'ccsm3'
    config_visible_ice_albedo = 0.73
/
&diagnostics
    config_check_state = .true.
/
""")
    assert cfg.run.dt == 1800.0
    assert cfg.velocity.elastic_subcycle_number == 240
    assert cfg.velocity.strain_scheme is StrainScheme.VARIATIONAL
    assert cfg.velocity.constitutive_relation is \
        ConstitutiveRelation.EVP_REVISED
    assert cfg.column.ktherm == 1
    assert cfg.column.kstrength == 0
    assert cfg.column.mu_rdg == 3.0
    assert cfg.column.pond_scheme == "topo"
    assert cfg.column.shortwave == "ccsm3"
    assert cfg.column.albicev == 0.73
    assert setup.check_state


def test_unknown_option_hard_errors():
    with pytest.raises(NamelistError, match="unknown namelist option"):
        config_from_namelist("&seaice_model\n config_bogus = 1\n/\n")


def test_unsupported_option_hard_errors_off_default():
    with pytest.raises(NamelistError, match="not supported"):
        config_from_namelist(
            "&seaice_model\n config_num_halos = 3\n/\n")
    # ... but is accepted at its default
    cfg, _ = config_from_namelist(
        "&seaice_model\n config_num_halos = 2\n/\n")
    assert isinstance(cfg, Config)


def test_unsupported_enum_value_hard_errors():
    with pytest.raises(NamelistError, match="not supported"):
        config_from_namelist(
            "&itd\n config_category_bounds_type = 'asymptotic'\n/\n")


def test_na_options_accepted_and_ignored():
    cfg, _ = config_from_namelist("""
&decomposition
    config_number_of_blocks = 64
    config_block_decomp_file_prefix = 'graphs/x.'
/
""")
    assert isinstance(cfg, Config)


def test_multiple_pond_schemes_rejected():
    with pytest.raises(NamelistError, match="pond"):
        config_from_namelist("""
&column_tracers
    config_use_cesm_meltponds = .true.
    config_use_level_meltponds = .true.
/
""")


def test_use_dynamics_false_gates_all_dynamics():
    cfg, _ = config_from_namelist(
        "&use_sections\n config_use_dynamics = .false.\n/\n")
    assert not cfg.velocity.use_velocity_solver
    assert cfg.advection.advection_type is AdvectionType.NONE
    assert not cfg.column.use_ridging


def test_zbgc_parameters_from_namelist():
    cfg, _ = config_from_namelist("""
&biogeochemistry
    config_use_vertical_biochemistry = .true.
    config_use_carbon = .true.
    config_use_iron = .true.
    config_maximum_growth_rate_diatoms = 2.0
    config_mortality_phaeocystis = 0.01
    config_nitrification_rate = 0.1
    config_fraction_loss_to_lipids = 0.4
/
""")
    p = cfg.column.zbgc_params
    assert p is not None
    assert cfg.column.use_biogeochemistry
    assert p.use_C and p.use_Fe
    assert p.mu_max[0] == 2.0
    assert p.mu_max[1] == 0.41          # untouched default
    assert p.mort_pre[2] == 0.01
    assert p.k_nitrif == 0.1
    assert p.f_doc == (0.5, 0.4)


def test_zbgc_params_reach_the_column_driver():
    from seaice_tpu.column.driver import ColumnPhysics
    cfg, _ = config_from_namelist("""
&biogeochemistry
    config_use_vertical_biochemistry = .true.
    config_maximum_growth_rate_diatoms = 2.5
/
""")
    col = ColumnPhysics(5, 7, use_biogeochemistry=True,
                        zbgc_params=cfg.column.zbgc_params)
    assert col.zbgc_params.mu_max[0] == 2.5


def test_shortwave_tuning_reaches_radiation():
    """config_visible_ice_albedo changes the ccsm3 albedo (a
    flag-changes-the-answer check for the new tuning plumbing)."""
    import jax.numpy as jnp
    from seaice_tpu.column.driver import ColumnPhysics

    def alb(albicev):
        col = ColumnPhysics(1, 7, shortwave="ccsm3",
                            shortwave_tuning=dict(albicev=albicev))
        aicen = jnp.ones((4, 1)) * 0.9
        vicen = jnp.ones((4, 1)) * 2.0      # thick ice -> albicev regime
        vsnon = jnp.zeros((4, 1))
        tsfc = jnp.full((4, 1), -10.0)
        one = jnp.ones((4,))
        r = col._step_radiation(aicen, vicen, vsnon, tsfc, one,
                                100.0 * one, 50.0 * one, 50.0 * one,
                                20.0 * one, {})
        return float(r.alvdr.mean())
    assert alb(0.9) > alb(0.5)


def test_audit_summary_counts():
    s = audit_summary()
    assert s["total"] == 316
    assert s["supported"] >= 190
    assert s["supported"] + s["na"] + s["unsupported"] == 316


def test_runsetup_defaults_match_registry():
    setup = RunSetup()
    assert setup.start_time == "2000-01-01_00:00:00"
    assert setup.initial_condition_type == "cice_default"
