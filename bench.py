"""Benchmark: EVP cells*subcycles/s per chip (the BASELINE.json north-star
metric) on the planar box test at QU120km-like cell count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md), so
vs_baseline is reported as 0.0 (no baseline to compare against yet).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from seaice_tpu.config import box_test_config
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box

    # QU120km has ~28k ocean cells; use a comparable planar box
    nx = ny = 168                      # 28,224 cells
    n_subcycles = 120                  # reference default (Registry:579-582)

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    cfg = box_test_config(elastic_subcycles=n_subcycles)
    mesh = box.box_test_mesh(nx, ny)
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=dtype)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    forcing = box.box_forcing(mesh, t=0.0, dtype=dtype)
    step = model.make_step()

    # warmup/compile; float() forces a device fetch — block_until_ready
    # alone does not synchronize through the axon TPU tunnel
    state1, _ = step(model.tensors, state, forcing)
    float(jnp.abs(state1.velocity.u_velocity).max())

    n_iters = 10
    t0 = time.perf_counter()
    s = state
    for _ in range(n_iters):
        s, _ = step(model.tensors, s, forcing)
    float(jnp.abs(s.velocity.u_velocity).max())
    dt = (time.perf_counter() - t0) / n_iters

    cells_subcycles_per_s = mesh.n_cells * n_subcycles / dt
    print(json.dumps({
        "metric": "evp_cells_subcycles_per_s",
        "value": round(cells_subcycles_per_s, 1),
        "unit": "cells*subcycles/s/chip",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
