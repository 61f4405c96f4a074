#!/usr/bin/env python
"""On-chip numerical comparison of the fused Pallas flux kernel vs the
XLA formulation — the interpret-mode equality test cannot see
TPU-specific matmul precision, so this measures it on real hardware.

Usage: python dev/micro_flux_check.py [--subdiv 4] [--steps 10]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp
    from seaice_tpu.mesh import icosahedral_mesh
    from seaice_tpu.mesh.rotation import latlon_vector_rotation_forward
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.config import (AdvectionConfig, AdvectionType,
                                   ColumnConfig, Config, RunConfig,
                                   VelocitySolverConfig)
    from seaice_tpu.namelist import RunSetup, initial_state_from_setup
    from seaice_tpu.column.driver import AtmosForcing, OceanForcing
    from seaice_tpu.dynamics.evp import DynamicsForcing

    dtype = jnp.float64 if args.f64 else jnp.float32
    mesh = icosahedral_mesh(args.subdiv)
    base = Config(
        run=RunConfig(dt=1800.0, n_categories=5, n_ice_layers=7),
        velocity=VelocitySolverConfig(
            elastic_subcycle_number=30,
            rotate_cartesian_grid=True, include_metric_terms=True,
            geostrophic_surface_tilt=False),
        advection=AdvectionConfig(
            advection_type=AdvectionType.INCREMENTAL_REMAP),
        column=ColumnConfig())
    setup = RunSetup(initial_condition_type="cice_default",
                     initial_latitude_north=60.0,
                     initial_latitude_south=-60.0)

    nc = mesh.n_cells
    lat = mesh.lat_cell
    # zonal wind with meridional convergence toward the poles + warm
    # enough air to drive melt ponds: a physics-rich trajectory
    u_ll = 8.0 * np.cos(3 * lat)
    v_ll = 4.0 * np.sign(lat) * np.cos(lat)
    u_r, v_r = latlon_vector_rotation_forward(
        u_ll, v_ll, mesh.x_cell, mesh.y_cell, mesh.z_cell)
    z = jnp.zeros((nc,), dtype)
    dyn = DynamicsForcing(
        u_air_velocity=jnp.asarray(u_r, dtype),
        v_air_velocity=jnp.asarray(v_r, dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=z, v_ocean_velocity=z,
        sea_surface_tilt_u=z, sea_surface_tilt_v=z,
        land_ice_mask=z)
    one = jnp.ones((nc,), dtype)
    atm = AtmosForcing(
        air_temperature=262.0 * one, specific_humidity=1e-3 * one,
        u_air=jnp.asarray(u_r, dtype), v_air=jnp.asarray(v_r, dtype),
        longwave_down=240.0 * one,
        sw_vis_dir=120.0 * one, sw_vis_dif=50.0 * one,
        sw_ir_dir=100.0 * one, sw_ir_dif=40.0 * one,
        rain_rate=0.0 * one, snow_rate=2e-6 * one,
        air_density=1.3 * one, air_level_height=10.0 * one)
    ocn = OceanForcing(
        sst=-1.5 * one, sss=34.0 * one,
        freezing_temperature=-1.8 * one, frzmlt=0.0 * one,
        mixed_layer_depth=20.0 * one)
    coszen = jnp.full((nc,), 0.4, dtype)

    outs = {}
    for name, flux_on in (("xla", False), ("pallas", True)):
        cfg = dataclasses.replace(base, advection=dataclasses.replace(
            base.advection, use_pallas_flux=flux_on))
        model = SeaIceModel(mesh, cfg, dtype=dtype)
        state = initial_state_from_setup(model, setup)
        step = model.make_step()
        for i in range(args.steps):
            state, _ = step(model.tensors, state, dyn, atm, ocn,
                            coszen=coszen)
        state = jax.tree.map(np.asarray, state)
        outs[name] = state

    worst = 0.0
    for k in sorted(outs["xla"].tracers):
        a = np.asarray(outs["xla"].tracers[k], np.float64)
        b = np.asarray(outs["pallas"].tracers[k], np.float64)
        s = max(np.abs(a).max(), 1e-30)
        rel = np.abs(a - b).max() / s
        worst = max(worst, rel)
        print(f"{k:28s} maxabs={np.abs(a).max():10.3e} "
              f"rel={rel:10.3e} "
              f"nan_xla={np.isnan(a).sum()} nan_pal={np.isnan(b).sum()}")
    print(f"WORST relative divergence after {args.steps} steps: "
          f"{worst:.3e}")


if __name__ == "__main__":
    main()
