"""Microbenchmarks for the unstructured fused-EVP gather engine design.

Measures on the real chip the primitives that decide the design of
`dynamics/pallas_unstructured.py` (fused whole-loop EVP for arbitrary
connectivity): XLA gather cost vs row width, the in-kernel one-hot
decode + MXU-dot gather pipeline (per chunk), and dot orientations.

All timings use the SLOPE between two inner-iteration counts — the
axon tunnel costs ~35 ms per dispatch, which would otherwise dominate.

Run: python dev/micro_gather.py   (expects the axon TPU tunnel)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope(make_fn, n_long, reps=7):
    """Per-iteration wall time via the slope between two chain lengths
    (cancels the fixed ~35 ms tunnel dispatch overhead)."""
    n_short = max(1, n_long // 8)

    def run(n):
        fn = make_fn(n)
        out = fn()
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_s = run(n_short)
    t_l = run(n_long)
    return max(t_l - t_s, 1e-12) / (n_long - n_short)


def bench_xla_gather():
    print("== 1. XLA gather: 245760 idx from [81920, W] ==")
    n_idx, n_src = 245760, 81920
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_src, n_idx), jnp.int32)
    for W in (1, 2, 4, 8, 32, 128):
        src = jnp.asarray(rng.standard_normal((n_src, W)), jnp.float32)

        def make(n):
            @jax.jit
            def f(src, idx):
                def body(i, acc):
                    return acc + src[idx] * 0.5
                return jax.lax.fori_loop(
                    0, n, body, jnp.zeros((n_idx, src.shape[1]),
                                          src.dtype))
            return lambda: f(src, idx)
        t = slope(make, 64)
        print(f"  W={W:4d}: {t*1e6:8.1f} us -> {n_idx/t/1e6:8.1f} M idx/s"
              f"  {n_idx*W*4/t/1e9:7.1f} GB/s")


def bench_chunk_pipeline():
    """End-to-end prototype of ONE chunk of the decode-gather design:
    decode K one-hot slabs from resident int32 indices, K forward dots
    gathering (u,v), K NT dots scattering 4 partial fields, per-chunk
    strain-ish VPU work.  NCHUNK chunks per 'subcycle', N_SUB subcycles
    in one kernel -> per-subcycle and per-solve cost."""
    print("== 2. fused chunk pipeline (decode + dots) ==")
    ME, K, NCHUNK, RV = 7, 7, 320, 640
    T = ME * 128
    rng = np.random.default_rng(0)
    widx = jnp.asarray(rng.integers(0, K * 128, (NCHUNK, 8, T)),
                       jnp.int32)[:, :1]          # [NCHUNK,1,T]
    wrow = jnp.asarray(rng.integers(0, RV - 1, (NCHUNK, K)), jnp.int32)
    u = jnp.asarray(rng.standard_normal((RV, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((RV, 128)), jnp.float32)

    # NOTE: kernel signature with PrefetchScalarGridSpec:
    # kernel(scalar0, *ins, *outs, *scratch)
    def make2(n_sub):
        def kernel(sm_wrow, widx_ref, u_ref, v_ref, out_ref, acc_ref):
            def sub_body(s, _):
                def chunk_body(c, _):
                    outT = jnp.zeros((8, T), jnp.float32)
                    duk = []
                    for k in range(K):
                        r = sm_wrow[c, k]
                        uvk = jnp.concatenate(
                            [u_ref[pl.ds(r, 1)], v_ref[pl.ds(r, 1)],
                             jnp.zeros((6, 128), jnp.float32)], axis=0)
                        wi = jax.lax.broadcasted_iota(
                            jnp.int32, (128, T), 0) + k * 128
                        oh = jnp.where(widx_ref[c, 0][None, :] == wi,
                                       1.0, 0.0).astype(jnp.bfloat16)
                        outT = outT + jax.lax.dot_general(
                            uvk.astype(jnp.bfloat16), oh,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        duk.append(oh)
                    uc = [outT[0:1, b * 128:(b + 1) * 128] for b in
                          range(ME)]
                    acc = jnp.zeros((8, 128), jnp.float32)
                    for b in range(ME):
                        for q in range(4):
                            acc = acc + uc[b] * (0.5 + b + q)
                    pT = jnp.concatenate(
                        [acc[0:1, :], jnp.zeros((7, 128), jnp.float32)],
                        axis=0)
                    pT = jnp.concatenate([pT] * ME, axis=1)
                    for k in range(K):
                        r = sm_wrow[c, k]
                        contrib = jax.lax.dot_general(
                            pT.astype(jnp.bfloat16), duk[k],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for f_ in range(4):
                            acc_ref[pl.ds(r, 1)] = (
                                acc_ref[pl.ds(r, 1)] +
                                contrib[f_:f_ + 1] * 1e-6)
                    return 0
                jax.lax.fori_loop(0, NCHUNK, chunk_body, 0)
                return 0
            acc_ref[:] = jnp.zeros((RV, 128), jnp.float32)
            jax.lax.fori_loop(0, n_sub, sub_body, 0)
            out_ref[:] = acc_ref[:]

        @jax.jit
        def f(wrow, widx, u, v):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((RV, 128), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(1,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((RV, 128), jnp.float32),
                    ],
                ),
            )(wrow, widx, u, v)
        return lambda: f(wrow, widx, u, v)

    t = slope(make2, 16, reps=5)
    print(f"  per-subcycle ({NCHUNK} chunks, K={K}, decode+2K dots): "
          f"{t*1e6:.1f} us -> 120 subcyc = {t*120*1e3:.1f} ms")


def bench_narrow_dot():
    print("== 3. narrow-F dot orientation (per-op, slope) ==")
    rng = np.random.default_rng(0)
    for (m, k, n) in [(8, 128, 896), (8, 896, 128), (128, 128, 896),
                      (8, 256, 768)]:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        def make(n_it):
            def kernel(a_ref, b_ref, out_ref):
                def body(i, acc):
                    return acc + jax.lax.dot_general(
                        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out_ref[:] = jax.lax.fori_loop(
                    0, n_it, body, jnp.zeros((m, n), jnp.float32))

            @jax.jit
            def f(a, b):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(a, b)
            return lambda: f(a, b)
        t = slope(make, 20000, reps=5)
        print(f"  [{m},{k}]@[{k},{n}]: {t*1e9:8.1f} ns "
              f" ({2*m*k*n/t/1e12:6.2f} TFLOP/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "gather"):
        bench_xla_gather()
    if which in ("all", "chunk"):
        bench_chunk_pipeline()
    if which in ("all", "dot"):
        bench_narrow_dot()
