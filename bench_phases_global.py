"""Global (panel-mesh) phase attribution on TPU: times the XLA vs
fused-Pallas velocity solve and the IR remap stages at a chosen
subdivision.  Single process only — the axon tunnel rejects a second
client.

Usage: python bench_phases_global.py [--subdiv 6] [--subcycles 120]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=6)
    ap.add_argument("--subcycles", type=int, default=120)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from seaice_tpu.config import Config, RunConfig, VelocitySolverConfig
    from seaice_tpu.dynamics.evp import (DynamicsForcing,
                                         build_dynamics_tensors,
                                         init_velocity_state,
                                         make_velocity_solver)
    from seaice_tpu.mesh import icosahedral_mesh
    from seaice_tpu.mesh.panels import panel_reorder

    mesh, lay = panel_reorder(icosahedral_mesh(args.subdiv),
                              args.subdiv)
    cfg = Config(run=RunConfig(dt=1800.0, n_categories=1),
                 velocity=VelocitySolverConfig(
                     elastic_subcycle_number=args.subcycles,
                     rotate_cartesian_grid=True,
                     include_metric_terms=True,
                     geostrophic_surface_tilt=False))
    dtype = jnp.float32
    dyn = build_dynamics_tensors(mesh, cfg, dtype)
    nc, nv = mesh.n_cells, mesh.n_vertices
    rng = np.random.default_rng(0)
    area = jnp.asarray(0.8 * np.ones((nc, 1)), dtype)
    vol = jnp.asarray(1.5 * np.ones((nc, 1)), dtype)
    snow = jnp.zeros_like(vol)
    forcing = DynamicsForcing(
        u_air_velocity=jnp.asarray(5 * rng.standard_normal(nc), dtype),
        v_air_velocity=jnp.asarray(2 * rng.standard_normal(nc), dtype),
        air_density=jnp.full((nc,), 1.3, dtype),
        u_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        v_ocean_velocity=jnp.asarray(
            0.05 * rng.standard_normal(nc), dtype),
        sea_surface_tilt_u=jnp.zeros((nc,), dtype),
        sea_surface_tilt_v=jnp.zeros((nc,), dtype),
        land_ice_mask=jnp.zeros((nc,), dtype))
    state = init_velocity_state(mesh, dtype)
    mde = float(np.min(mesh.dv_edge[mesh.dv_edge > 0]))

    def timeit(fn, n=6):
        out = fn()
        float(jnp.abs(out[0].u_velocity).max())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.abs(out[0].u_velocity).max())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    out = {"subdiv": args.subdiv, "n_cells": nc,
           "subcycles": args.subcycles}
    for use_pl in (False, True):
        solver = make_velocity_solver(cfg, min_dv_edge=mde,
                                      panel_n=lay.N, use_pallas=use_pl)
        jsol = jax.jit(lambda d, s: solver(d, s, forcing, area, vol,
                                           snow))
        t = timeit(lambda: jsol(dyn, state))
        key = "velocity_ms_pallas" if use_pl else "velocity_ms_xla"
        out[key] = round(t, 1)
        print(key, out[key])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
