"""Per-phase attribution of the FULL north-star step at subdiv-6.

Times each phase of the full-physics step (column therm1+therm2,
velocity solve, IR remap, ridging, post-dynamics snow) as separately
jitted programs on the bench_full.py workload, plus the whole fused
step — the TPU analog of the reference's per-phase timers
(`/root/reference/src/shared/mpas_seaice_time_integration.F:100-167`,
velocity sub-phase timers `mpas_seaice_velocity_solver.F:2515-2584`).

Chained-scan timing per phase (see bench.py): the axon tunnel costs
~35 ms per dispatch, far more than most phases, so each phase is run
K times inside one lax.scan and the slope between two chain lengths
is reported.

Usage: python bench_phases_full.py [--subdiv 6] [--subcycles 120]
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


def chained(fn, state0, k_short=2, k_long=10, n_iters=5):
    """Per-call time of fn(state)->state by scan-chain slope."""
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def run(s):
            def body(s, _):
                return fn(s), 0.0
            s, _ = jax.lax.scan(body, s, None, length=k)
            return s
        return run

    def probe(s):
        leaf = jax.tree.leaves(s)[0]
        return float(jnp.abs(leaf).max())

    def timed(run):
        s = run(state0)
        probe(s)
        ts = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            s = run(state0)
            probe(s)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_s = timed(chain(k_short))
    t_l = timed(chain(k_long))
    return max(t_l - t_s, 1e-9) / (k_long - k_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=6)
    ap.add_argument("--subcycles", type=int, default=120)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_full
    from seaice_tpu.transport import make_remap_step

    model, state, (dyn, atm, ocn, coszen) = bench_full.build(
        args.subdiv, args.subcycles)
    cfg = model.cfg
    column = model.column
    tensors = model.tensors
    out = {"subdiv": args.subdiv, "n_cells": model.mesh.n_cells,
           "subcycles": args.subcycles}

    # -- whole step --
    step = model.make_step()

    def whole(s):
        s2, _ = step(tensors, s, dyn, atm, ocn, coszen=coszen)
        return s2

    out["step_ms"] = round(chained(whole, state) * 1e3, 2)
    print("step_ms", out["step_ms"], flush=True)

    # -- column therm1+therm2 --
    def therm(tr):
        tr2, _ = column.step_thermodynamics(
            cfg.run.dt, tr, atm, ocn, coszen=coszen)
        return tr2

    out["column_thermo_ms"] = round(
        chained(therm, dict(state.tracers)) * 1e3, 2)
    print("column_thermo_ms", out["column_thermo_ms"], flush=True)

    # -- velocity solve (the jitted full solver incl. 120 subcycles) --
    from seaice_tpu.dynamics import evp
    vel_step = model.make_step  # noqa: F841  (built inside step)
    lay = getattr(model.mesh, "panel_layout", None)
    solver = evp.make_velocity_solver(
        cfg, min_dv_edge=float(np.min(
            model.mesh.dv_edge[model.mesh.dv_edge > 0])),
        panel_n=(lay.N if lay is not None else None),
        panel_mesh=(model.mesh if lay is not None else None),
        use_pallas=model._pallas_subcycle_eligible(None, None))
    tr0 = state.tracers

    def vel(v):
        v2, _ = solver(tensors.dynamics, v, dyn,
                       tr0["iceAreaCategory"], tr0["iceVolumeCategory"],
                       tr0["snowVolumeCategory"],
                       pressure_in=column.ice_strength(tr0))
        return v2

    out["velocity_ms"] = round(chained(vel, state.velocity) * 1e3, 2)
    print("velocity_ms", out["velocity_ms"], flush=True)

    # -- IR remap over the full tracer tree --
    remap_step = make_remap_step(model.tree, model.mesh.vertex_degree,
                                 monotonic=cfg.advection.monotonic)
    uv, vv = state.velocity.u_velocity, state.velocity.v_velocity

    def remap(tr):
        return remap_step(tensors.remap, tensors.mesh.cells_on_cell,
                          tensors.mesh.cells_on_cell_mask,
                          tensors.area_cell, tr, uv, vv,
                          cfg.dynamics_timestep)

    out["remap_ms"] = round(chained(remap, dict(state.tracers)) * 1e3, 2)
    print("remap_ms", out["remap_ms"], flush=True)

    # -- ridging --
    nc = model.mesh.n_cells
    conv_r = jnp.full((nc,), -1e-7, model.dtype)
    shear_r = jnp.full((nc,), 5e-8, model.dtype)

    def ridge(tr):
        tr2, _ = column.step_ridging(cfg.dynamics_timestep, tr,
                                     conv_r, shear_r)
        return tr2

    out["ridging_ms"] = round(
        chained(ridge, dict(state.tracers)) * 1e3, 2)
    print("ridging_ms", out["ridging_ms"], flush=True)

    # -- post-dynamics (snow + coupling prep) --
    wind = jnp.sqrt(atm.u_air ** 2 + atm.v_air ** 2)

    def post(tr):
        tr2, _ = column.step_post_dynamics(cfg.run.dt, tr, wind=wind,
                                           snow_rate=atm.snow_rate)
        return tr2

    out["post_dynamics_ms"] = round(
        chained(post, dict(state.tracers)) * 1e3, 2)
    print("post_dynamics_ms", out["post_dynamics_ms"], flush=True)

    # -- Rothrock strength alone (kept live through the carry so the
    #    scan cannot hoist it) --
    def strength(tr):
        p = column.ice_strength(tr)
        tr2 = dict(tr)
        tr2["iceAreaCategory"] = jnp.where(
            p[..., None] > 1e30, p[..., None], tr["iceAreaCategory"])
        return tr2

    out["strength_ms"] = round(
        chained(strength, dict(state.tracers)) * 1e3, 2)
    print("strength_ms", out["strength_ms"], flush=True)

    # -- the dynamics sub-loop EXACTLY as the model composes it
    #    (strength -> velocity -> remap -> ridging, state threaded) —
    #    step_ms - therm - post - dyn_subloop = residual glue --
    def dynloop(carry):
        v, tr = carry
        pressure = column.ice_strength(tr)
        v2, diags = solver(tensors.dynamics, v, dyn,
                           tr["iceAreaCategory"],
                           tr["iceVolumeCategory"],
                           tr["snowVolumeCategory"],
                           pressure_in=pressure)
        tr2 = remap_step(tensors.remap, tensors.mesh.cells_on_cell,
                         tensors.mesh.cells_on_cell_mask,
                         tensors.area_cell, tr, v2.u_velocity,
                         v2.v_velocity, cfg.dynamics_timestep)
        tr3, _ = column.step_ridging(cfg.dynamics_timestep, tr2,
                                     diags["ridge_convergence"],
                                     diags["ridge_shear"])
        return (v2, tr3)

    out["dyn_subloop_ms"] = round(
        chained(dynloop, (state.velocity, dict(state.tracers)))
        * 1e3, 2)
    print("dyn_subloop_ms", out["dyn_subloop_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
