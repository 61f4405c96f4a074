"""Benchmark: EVP cells*subcycles/s per chip (the BASELINE.json north-star
metric) on the planar box test at QU120km-like cell count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement: K model steps are chained inside ONE jitted lax.scan and the
per-step time is the SLOPE between two chain lengths.  This reports the
sustained throughput of a production run (one dispatch per coupling
interval, not per step) and removes the fixed per-dispatch overhead of
the remote-TPU tunnel (~35 ms/call), which at this problem size would
otherwise dominate and under-report the machine by >10x.

vs_baseline: the reference Fortran model cannot be built in this image
(it links the external MPAS framework, which is not vendored, and no
MPI toolchain exists — see BASELINE.md), so the baseline is the SAME
workload on the CPU host (measured once and cached in
.bench_cpu_baseline.json): vs_baseline = TPU-chip / CPU-host
throughput for the identical physics at the same precision (f32).
"""

import json

# persistent XLA compilation cache: repeat bench runs skip the
# multi-minute full-physics compile
os_cache = __import__("os")
os_cache.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/jax_cache")
os_cache.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os_cache.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
CPU_CACHE = os.path.join(ROOT, ".bench_cpu_baseline.json")


def _chained_step_time(model, state, forcing, k_short, k_long, n_iters):
    """Median wall time of one model step, by the slope between two
    scan-chain lengths (removes fixed dispatch overhead)."""
    import jax
    import jax.numpy as jnp

    step = model.make_step()

    def chain(k):
        @jax.jit
        def run(tensors, state, forcing):
            def body(s, _):
                s2, _diags = step(tensors, s, forcing)
                return s2, 0.0
            s, _ = jax.lax.scan(body, state, None, length=k)
            return s
        return run

    def timed(run):
        s = run(model.tensors, state, forcing)       # warmup/compile
        # float() forces a device fetch — block_until_ready alone does
        # not synchronize through the axon TPU tunnel
        float(jnp.abs(s.velocity.u_velocity).max())
        ts = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            s = run(model.tensors, state, forcing)
            float(jnp.abs(s.velocity.u_velocity).max())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_short = timed(chain(k_short))
    t_long = timed(chain(k_long))
    return max(t_long - t_short, 1e-9) / (k_long - k_short)


def measure(nx, n_subcycles, n_iters=5, k_short=4, k_long=100):
    # chain lengths: the axon tunnel costs ~35 ms/dispatch with ms-level
    # jitter, so the chain-length difference must put the per-step
    # signal well above that jitter (at ~65 us/step the old k_long=12
    # gave a 0.7 ms signal — noise-dominated)
    import jax
    import jax.numpy as jnp

    from seaice_tpu.config import box_test_config
    from seaice_tpu.mesh.structured import raster_reorder
    from seaice_tpu.model import SeaIceModel
    from seaice_tpu.testcases import box

    dtype = jnp.float32

    cfg = box_test_config(elastic_subcycles=n_subcycles)
    # raster vertex order enables the structured (shift-based) EVP
    # kernels and the fused Pallas subcycle kernel on the regular grid
    mesh = raster_reorder(box.box_test_mesh(nx, nx))
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    model = SeaIceModel(mesh, cfg, dtype=dtype)
    area, vol, snow = box.box_initial_state(mesh, n_categories=1)
    state = model.init_state(area, vol, snow)
    forcing = box.box_forcing(mesh, t=0.0, dtype=dtype)

    dt_step = _chained_step_time(model, state, forcing,
                                 k_short, k_long, n_iters)
    return mesh.n_cells * n_subcycles / dt_step


def cpu_baseline(nx, n_subcycles):
    """Measured once on the CPU host, cached (the stand-in for the
    unbuildable Fortran reference; same workload, same physics)."""
    if os.path.exists(CPU_CACHE):
        with open(CPU_CACHE) as f:
            d = json.load(f)
        if d.get("nx") == nx and d.get("subcycles") == n_subcycles \
                and d.get("v") == 3:
            return d["cells_subcycles_per_s"]
    code = (
        "import json,sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import bench; "
        "print(json.dumps({'v': bench.measure(%d, %d, n_iters=2, "
        "k_short=1, k_long=3)}))"
        % (ROOT, nx, n_subcycles))
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=2400,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        val = json.loads(out.stdout.strip().splitlines()[-1])["v"]
        with open(CPU_CACHE, "w") as f:
            json.dump({"nx": nx, "subcycles": n_subcycles, "v": 3,
                       "cells_subcycles_per_s": val}, f)
        return val
    except Exception:
        return 0.0


def main():
    nx = 168                           # 28,224 cells ~ QU120km ocean count
    n_subcycles = 120                  # reference default (Registry:579-582)
    backend = "tpu"
    # probe the axon tunnel in a SUBPROCESS (a dead tunnel makes
    # jax.devices() hang in-process).  The tunnel can drop and come
    # back, so retry with backoff (~10 min total) before giving up;
    # only then fall back to CPU and SAY SO.  A fallback number is a
    # host number, so vs_baseline is reported as 0.0 — a CPU/CPU ratio
    # is not the metric.
    ok = False
    for attempt in range(6):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                capture_output=True, timeout=120)
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            break
        time.sleep(min(20 * (attempt + 1), 120))
    if not ok:
        backend = "cpu_fallback_tunnel_down"
        import jax
        jax.config.update("jax_platforms", "cpu")
    tpu = measure(nx, n_subcycles)
    base = cpu_baseline(nx, n_subcycles)
    out = {
        "metric": "evp_cells_subcycles_per_s",
        "value": round(tpu, 1),
        "unit": "cells*subcycles/s/chip",
        "backend": backend,
        # honest ratio: only meaningful when the numerator really ran
        # on the chip
        "vs_baseline": round(tpu / base, 2) if (base and ok) else 0.0,
    }
    # north-star full-physics config (VERDICT r4 item 1): icos subdiv-6
    # global mesh, 5 cat / 7 layers, mushy + dEdd + lvl ponds +
    # Rothrock, EVP 120 + full-tracer IR + ridging.  Reported in the
    # same JSON line so BENCH_rN.json captures the production config;
    # failures (e.g. tunnel flake mid-compile) must not lose the
    # primary metric.
    if ok:
        try:
            import bench_full
            nc_ns, dt_ns = bench_full.measure(6, 120)
            out["north_star_ms_per_step"] = round(dt_ns * 1e3, 2)
            out["north_star_cells_subcycles_per_s"] = round(
                nc_ns * 120 / dt_ns, 1)
            out["north_star_config"] = (
                "icos subdiv-6 global, 5cat/7lay, mushy+dEdd+lvlponds+"
                "Rothrock, EVP120+IR+ridging, f32")
        except Exception as e:          # noqa: BLE001
            out["north_star_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
