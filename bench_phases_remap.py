"""Per-stage attribution of the IR remap step at subdiv-6.

Splits the dominant phase of the full step (bench_phases_full showed
remap at ~215 ms of the 415 ms subdiv-6 step) into its five stages —
masks+reconstruction, departure geometry, flux integration, update,
zap — timed as separately jitted scan-chained programs (see bench.py
for the chained-slope method).

Usage: python bench_phases_remap.py [--subdiv 6]
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

from bench_phases_full import chained  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=6)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench_full
    from seaice_tpu.transport import remap as R

    model, state, _ = bench_full.build(args.subdiv, 120)
    cfg = model.cfg
    tree = model.tree
    rt = model.tensors.remap
    coc = model.tensors.mesh.cells_on_cell
    cocm = model.tensors.mesh.cells_on_cell_mask
    area_cell = model.tensors.area_cell
    vd = model.mesh.vertex_degree
    dt = cfg.dynamics_timestep
    uv, vv = state.velocity.u_velocity, state.velocity.v_velocity
    out = {"subdiv": args.subdiv, "n_cells": model.mesh.n_cells}

    state0 = dict(state.tracers)

    # whole remap
    step = R.make_remap_step(tree, vd, monotonic=cfg.advection.monotonic)

    def whole(tr):
        return step(rt, coc, cocm, area_cell, tr, uv, vv, dt)

    out["remap_ms"] = round(chained(whole, state0) * 1e3, 2)
    print("remap_ms", out["remap_ms"], flush=True)

    # stage A: to_transport + masks + reconstruction (a data-dependent
    # scalar is folded back into the carry so the stage is not DCE'd)
    import jax

    def recon_stage(tr):
        fields = R.to_transport_fields(tree, tr)
        mask_cell, masks = R.make_masks(tree, fields)
        recon = R.reconstruct_fields(
            tree, fields, masks, mask_cell, rt, coc, cocm,
            monotonic=cfg.advection.monotonic)
        s = sum(jnp.asarray(v).sum()
                for v in jax.tree.leaves(recon)[:4])
        tr = dict(tr)
        tr["iceAreaCategory"] = tr["iceAreaCategory"] + 0.0 * s
        return tr

    out["recon_ms"] = round(chained(recon_stage, state0) * 1e3, 2)
    print("recon_ms", out["recon_ms"], flush=True)

    # stage B: departure geometry (triangles + cell coords)
    def geom(uvv):
        u, v = uvv
        dpx, dpy = R.departure_points(u, v, dt)
        tris = R.find_departure_triangles(rt, dpx, dpy, vd)
        cell, xq, yq, area = R.triangles_to_cell_coords(rt, tris)
        # fold back into a velocity-shaped carry so scan can chain
        return (u + 0.0 * area.sum(), v + 0.0 * xq.sum())

    out["geometry_ms"] = round(chained(geom, (uv, vv)) * 1e3, 2)
    print("geometry_ms", out["geometry_ms"], flush=True)

    # precompute static inputs for later stages
    fields0 = R.to_transport_fields(tree, state0)
    mask_cell0, masks0 = R.make_masks(tree, fields0)
    recon0 = jax.jit(lambda: R.reconstruct_fields(
        tree, fields0, masks0, mask_cell0, rt, coc, cocm,
        monotonic=cfg.advection.monotonic))()
    dpx0, dpy0 = R.departure_points(uv, vv, dt)
    tris0 = jax.jit(
        lambda: R.find_departure_triangles(rt, dpx0, dpy0, vd))()
    cell0, xq0, yq0, area0 = jax.jit(
        lambda: R.triangles_to_cell_coords(rt, tris0))()
    mask_edge0 = tris0["mask_edge"]

    # stage C: flux integration
    def flux(xy):
        xq, yq = xy
        fl = R.integrate_fluxes(tree, recon0, rt, cell0, xq, yq,
                                area0, mask_edge0)
        s = sum(jnp.asarray(v).sum() for v in jax.tree.leaves(fl))
        return (xq + 0.0 * s, yq)

    out["flux_ms"] = round(chained(flux, (xq0, yq0)) * 1e3, 2)
    print("flux_ms", out["flux_ms"], flush=True)

    # stage D: update + zap
    fluxes0 = jax.jit(lambda: R.integrate_fluxes(
        tree, recon0, rt, cell0, xq0, yq0, area0, mask_edge0))()

    def upd(fields):
        nf = R.update_mass_and_tracers(tree, fields, fluxes0, rt,
                                       area_cell)
        nf = R.zap_small_mass(tree, nf)
        return nf

    out["update_ms"] = round(chained(upd, fields0) * 1e3, 2)
    print("update_ms", out["update_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
