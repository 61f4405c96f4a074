"""Per-phase timing harness (the reference's timer taxonomy analog,
mpas_seaice_velocity_solver.F:2515-2584 / BASELINE.md row 5): times the
EVP subcycle and its sub-kernels (gathers, contractions, stress update,
momentum), the IR remap, and the column phase separately on the current
backend.  Run on the real TPU to attribute the step cost before
optimizing.

Usage: python bench_phases.py [--nx 168] [--subcycles 120]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, n=20, fetch=None):
    """Median-of-n wall time; forces a device fetch each call (the axon
    tunnel does not sync on block_until_ready)."""
    import jax.numpy as jnp
    out = fn(*args)
    f = fetch or (lambda o: float(jnp.asarray(o)[0].reshape(-1)[0])
                  if isinstance(o, tuple) else
                  float(jnp.asarray(o).reshape(-1)[0]))
    f(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        f(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=168)
    ap.add_argument("--subcycles", type=int, default=120)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seaice_tpu.config import box_test_config
    from seaice_tpu.dynamics import variational_fast as vf
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box

    dtype = jnp.float32
    cfg = box_test_config(elastic_subcycles=args.subcycles)
    mesh = box.box_test_mesh(args.nx, args.nx)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=dtype)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    forcing = box.box_forcing(mesh, t=0.0, dtype=dtype)
    ft = model.tensors.dynamics.fast
    nc, nv, me = mesh.n_cells, mesh.n_vertices, mesh.max_edges
    print(f"backend={jax.default_backend()} nc={nc} nv={nv} me={me}",
          file=sys.stderr)

    report = {}

    def rec(k, v):
        report[k] = round(v, 3)
        print(f"{k}: {report[k]}", file=sys.stderr, flush=True)

    # full step
    step = model.make_step()
    t = timeit(lambda: step(model.tensors, state, forcing), n=5,
               fetch=lambda o: float(o[0].velocity.u_velocity[0]))
    rec("full_step_ms", t * 1e3)
    rec("cells_subcycles_per_s", nc * args.subcycles / t)

    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (nv,), dtype)
    v = jax.random.normal(key, (nv,), dtype)
    sT = jax.random.normal(key, (me, nc), dtype) * 100.0
    sv = jnp.ones((nv,), dtype)

    # Sub-kernel timings: each op loops K times INSIDE one jitted
    # program (a single device fetch per measurement) — per-call
    # timing through the axon tunnel measures ~33 ms of host RTT, not
    # device time.
    K = 200

    def looped(op, init):
        @jax.jit
        def run(init):
            return jax.lax.fori_loop(0, K, lambda i, x: op(x), init)
        return run

    # cell-side gather: uv[voc_T]
    def op_cell_gather(carry):
        u, v = carry
        uv = jnp.stack([u, v], axis=-1)
        g = uv[ft.voc_T] * ft.voc_mask_T[..., None]
        # cheap reduction keeps every gathered row live
        return (u + 1e-30 * jnp.sum(g), v - 1e-30 * jnp.sum(g))

    run = looped(op_cell_gather, (u, v))
    rec("cell_gather_us", timeit(
        run, (u, v), n=10,
        fetch=lambda o: float(o[0][0])) * 1e6 / K)

    # strain contraction only
    gx = ft.basis_grad_T[:, 0]
    gy = ft.basis_grad_T[:, 1]

    def op_strain(carry):
        u_c, v_c = carry
        e11 = (u_c[:, None, :] * gx).sum(0)
        e22 = (v_c[:, None, :] * gy).sum(0)
        e12 = 0.5 * ((u_c[:, None, :] * gy).sum(0) +
                     (v_c[:, None, :] * gx).sum(0))
        return e11 + 1e-30 * e12, e22 - 1e-30 * e12

    run = looped(op_strain, (sT, sT))
    rec("strain_contract_us", timeit(
        run, (sT, sT), n=10, fetch=lambda o: float(o[0][0, 0]))
        * 1e6 / K)

    # stress divergence (contraction + vertex gather)
    def op_div(s):
        du, dv = vf.stress_divergence_T(ft, s, s, s, sv, False)
        return s + 1e-30 * (jnp.sum(du) + jnp.sum(dv))

    run = looped(op_div, sT)
    rec("divergence_us", timeit(
        run, sT, n=10, fetch=lambda o: float(o[0, 0])) * 1e6 / K)

    # vertex-side gather only
    flat0 = jnp.moveaxis(jnp.stack([sT, sT], axis=-1), 0, 1
                         ).reshape(nc * me, 2)

    def op_vgather(flat):
        g = flat[ft.flat_corner_idx] * ft.cov_mask_T[..., None]
        return flat + 1e-30 * jnp.sum(g)

    run = looped(op_vgather, flat0)
    rec("vertex_gather_us", timeit(
        run, flat0, n=10, fetch=lambda o: float(o[0, 0])) * 1e6 / K)

    # one full fused subcycle (strain->stress->div->momentum)
    from seaice_tpu.dynamics import constitutive as cons
    dt_e = cfg.elastic_timestep
    damping = cfg.evp_damping_timescale
    p_T = jnp.full((1, nc), 1e4, dtype)

    def op_subcycle(carry):
        u, v, t11, t22, t12 = carry
        e11, e22, e12 = vf.strain_tensor_T(ft, u, v, False)
        n11, n22, n12, _ = cons.evp_stress_update(
            t11, t22, t12, e11, e22, e12, p_T, dt_e, damping)
        du, dv = vf.stress_divergence_T(ft, n11, n22, n12, sv, False)
        return u + 1e-3 * du, v + 1e-3 * dv, n11, n22, n12

    run = looped(op_subcycle, (u, v, sT, sT, sT))
    rec("one_subcycle_us", timeit(
        run, (u, v, sT, sT, sT), n=10,
        fetch=lambda o: float(o[0][0])) * 1e6 / K)

    # IR remap with minimal tree (the model's transport phase)
    from seaice_tpu.transport import (build_remap_geometry,
                                      make_remap_step)
    rt = build_remap_geometry(mesh,
                              rotate_cartesian_grid=False).tensors(dtype)
    remap = jax.jit(make_remap_step(model.tree, mesh.vertex_degree,
                                    monotonic=True))
    tr0 = state.tracers
    rec("remap_ms", timeit(
        lambda: remap(rt, model.tensors.mesh.cells_on_cell,
                      model.tensors.mesh.cells_on_cell_mask,
                      model.tensors.area_cell, tr0, u * 0.01, v * 0.01,
                      600.0), n=10,
        fetch=lambda o: float(o["iceAreaCategory"][0, 0])) * 1e3)

    # remap stage breakdown (smaller loop count: heavier stages)
    K2 = 20

    def looped2(op, init):
        @jax.jit
        def run(init):
            return jax.lax.fori_loop(0, K2, lambda i, x: op(x), init)
        return run

    from seaice_tpu.transport import remap as R
    tree = model.tree
    fields0 = R.to_transport_fields(tree, tr0)
    coc = model.tensors.mesh.cells_on_cell
    cocm = model.tensors.mesh.cells_on_cell_mask
    uq, vq = u * 0.01, v * 0.01

    def op_recon(fields):
        mask_cell, masks = R.make_masks(tree, fields)
        recon = R.reconstruct_fields(tree, fields, masks, mask_cell, rt,
                                     coc, cocm, monotonic=True)
        leaf = recon["iceAreaCategory"]["center"]
        return {k: v + 1e-30 * jnp.sum(leaf) for k, v in fields.items()}

    run = looped2(lambda f: op_recon(f), fields0)
    rec("remap_reconstruct_ms", timeit(
        run, fields0, n=5,
        fetch=lambda o: float(o["iceAreaCategory"][0, 0])) * 1e3 / K2)

    dpx0, dpy0 = R.departure_points(uq, vq, 600.0)

    def op_tris(carry):
        dpx, dpy = carry
        tris = R.find_departure_triangles(rt, dpx, dpy,
                                          mesh.vertex_degree)
        s = jnp.sum(tris["mask_edge"])
        return dpx + 1e-30 * s, dpy

    run = looped2(op_tris, (dpx0, dpy0))
    rec("remap_triangles_ms", timeit(
        run, (dpx0, dpy0), n=5,
        fetch=lambda o: float(o[0][0])) * 1e3 / K2)

    tris0 = R.find_departure_triangles(rt, dpx0, dpy0,
                                       mesh.vertex_degree)
    cell0, xq0, yq0, areaq0 = R.triangles_to_cell_coords(rt, tris0)
    mask_cell0, masks0 = R.make_masks(tree, fields0)
    recon0 = R.reconstruct_fields(tree, fields0, masks0, mask_cell0,
                                  rt, coc, cocm, monotonic=True)

    def op_flux(carry):
        xq, yq = carry
        fluxes = R.integrate_fluxes(tree, recon0, rt, cell0, xq, yq,
                                    areaq0, tris0["mask_edge"])
        s = jnp.sum(fluxes["iceAreaCategory"])
        return xq + 1e-30 * s, yq

    run = looped2(op_flux, (xq0, yq0))
    rec("remap_flux_integrate_ms", timeit(
        run, (xq0, yq0), n=5,
        fetch=lambda o: float(o[0][0, 0, 0])) * 1e3 / K2)

    def op_coords(carry):
        dpx, dpy = carry
        tris = R.find_departure_triangles(rt, dpx, dpy,
                                          mesh.vertex_degree)
        cell, xq, yq, areaq = R.triangles_to_cell_coords(rt, tris)
        s = jnp.sum(xq) + jnp.sum(areaq)
        return dpx + 1e-30 * s, dpy

    run = looped2(op_coords, (dpx0, dpy0))
    rec("remap_tris_plus_coords_ms", timeit(
        run, (dpx0, dpy0), n=5,
        fetch=lambda o: float(o[0][0])) * 1e3 / K2)

    fluxes0 = R.integrate_fluxes(tree, recon0, rt, cell0, xq0, yq0,
                                 areaq0, tris0["mask_edge"])

    def op_update(fields):
        nf = R.update_mass_and_tracers(tree, fields, fluxes0, rt,
                                       model.tensors.area_cell)
        nf = R.zap_small_mass(tree, nf)
        return {k: fields[k] + 1e-30 * jnp.sum(nf[k])
                for k in fields}

    run = looped2(op_update, fields0)
    rec("remap_update_ms", timeit(
        run, fields0, n=5,
        fetch=lambda o: float(o["iceAreaCategory"][0, 0])) * 1e3 / K2)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
