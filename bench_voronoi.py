"""Velocity-solver throughput on a genuinely unstructured mesh.

Compares the EVP velocity solve (120 subcycles, variational/Wachspress,
metric terms) on three spherical meshes of the same size:

  * panel   — panel-reordered icosahedral mesh (shift/Pallas fast path)
  * icos    — raw icosahedral hex mesh (general gather path)
  * voronoi — SCVT-style Lloyd-relaxed jittered Voronoi mesh (general
              gather path; no panel or raster structure exists)

The VERDICT round-2 target: a real SCVT/Voronoi mesh — the family the
reference's QU120km production meshes belong to
(`/root/reference/testing_and_setup/testing/README.rst:60-76`) — must
run within ~2x of the panel-mesh cells*subcycles/s.

Usage: python bench_voronoi.py [--subdiv 6] [--subcycles 120]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from bench_phases_full import chained  # noqa: E402


def time_velocity(mesh_kind, subdiv, subcycles):
    import numpy as np

    import bench_full
    from seaice_tpu.dynamics import evp

    model, state, (dyn, _atm, _ocn, _cz) = bench_full.build(
        subdiv, subcycles, mesh_kind=mesh_kind)
    cfg = model.cfg
    lay = getattr(model.mesh, "panel_layout", None)
    solver = evp.make_velocity_solver(
        cfg, min_dv_edge=float(np.min(
            model.mesh.dv_edge[model.mesh.dv_edge > 0])),
        panel_n=(lay.N if lay is not None else None),
        panel_mesh=(model.mesh if lay is not None else None),
        use_pallas=model._pallas_subcycle_eligible(None, None),
        unstructured_plan=(model.tensors.dynamics.unstructured
                           if lay is None else None))
    tr0 = state.tracers
    tensors = model.tensors
    column = model.column

    def vel(v):
        v2, _ = solver(tensors.dynamics, v, dyn,
                       tr0["iceAreaCategory"], tr0["iceVolumeCategory"],
                       tr0["snowVolumeCategory"],
                       pressure_in=column.ice_strength(tr0))
        return v2

    ms = chained(vel, state.velocity) * 1e3
    return model.mesh.n_cells, ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=6)
    ap.add_argument("--subcycles", type=int, default=120)
    ap.add_argument("--kinds", default="panel,voronoi")
    args = ap.parse_args()

    out = {"subdiv": args.subdiv, "subcycles": args.subcycles}
    rates = {}
    for kind in args.kinds.split(","):
        nc, ms = time_velocity(kind, args.subdiv, args.subcycles)
        rate = nc * args.subcycles / (ms * 1e-3)
        rates[kind] = rate
        out[f"{kind}_ms"] = round(ms, 2)
        out[f"{kind}_cells_subcycles_per_s"] = round(rate, 1)
        print(kind, round(ms, 2), "ms", flush=True)
    if "panel" in rates and "voronoi" in rates:
        out["voronoi_vs_panel"] = round(
            rates["voronoi"] / rates["panel"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
