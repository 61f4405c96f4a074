"""Pallas fused cell-side EVP kernel for icosahedral panel meshes.

The spherical counterpart of `pallas_evp.py`: on the sphere the
Wachspress basis varies per cell, so the [6,2,6,npc] basis tensors
cannot collapse into SMEM constants and the whole-loop VMEM-resident
design does not fit (~30 MB of basis).  Instead this kernel fuses the
CELL-SIDE pipeline of one elastic subcycle — corner-velocity slice
reads, the strain contraction, the EVP stress relaxation, and the
stress-divergence partial products — into one blocked Pallas pass:
the basis is streamed block-by-block from HBM exactly once per
subcycle and every intermediate ([6,6,npc] strain products, corner
stacks, stress temporaries) lives in registers/VMEM, never HBM.

The vertex-side work (seam-ghost refresh, dual-shift accumulation,
momentum solve) and the 12-cell exception path stay in XLA
(`variational_panel.py` / `evp.py`); the kernel zeroes nothing they
need — exception columns carry zero basis, so their strain/partials
vanish in-kernel and XLA overwrites their stress update exactly.

Numerics are identical to the XLA panel path up to float32 reduction
reassociation (`tests/test_pallas_panel.py` asserts trajectory
agreement against the XLA oracle).  Reference hot loop:
`mpas_seaice_velocity_solver.F:2478-2592` with the variational kernels
:575-670 / :777-975 / :1064-1184.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as c

def build_panel_cell_kernel(N: int, npc: int, *, dt_elastic: float,
                            damping_timescale: float,
                            include_metric: bool,
                            block: int = 2048,
                            interpret: Optional[bool] = None):
    """Build fn(corner_planes, t11, t22, t12, press, ss) ->
    (t11n, t22n, t12n, pu, pv[, mu, mv]) with

      corner_planes [6, F, npc_pad]: per-corner vertex fields in
          field-major layout (F = 3 with metric: u, v, tan(lat)/r).
          The six shifted panel reads are materialized by XLA static
          slices (`variational_panel.corner_planes`) so every Pallas
          load is block-aligned — Mosaic rejects lane-dim loads at
          offsets not provably multiples of 128, which the raw
          panel-shift offsets (pad0 + d) are not;
      t** [6, npc]: slot-indexed corner stresses (aliased outputs);
      press/ss [npc]: replacement pressure and the solve-stress mask
          with the exception columns zeroed.

    basis tensors are closed over at call time (passed as inputs)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = block
    npc_pad = ((npc + B - 1) // B) * B
    grid = npc_pad // B

    dte = float(dt_elastic)
    denom_c = 1.0 + (0.5 * dte) / float(damping_timescale)
    p_scale = dte / (2.0 * float(damping_timescale))
    ecc2 = float(c.EVP_ECCENTRICITY_SQ)
    puny = float(c.PUNY)
    F = 3 if include_metric else 2
    n_out_f = 4 if include_metric else 2

    def kernel(cp_ref, t11_ref, t22_ref, t12_ref, press_ref,
               ss_ref, bg_ref, bi_ref, *rest):
        if include_metric:
            (bm_ref, o11_ref, o22_ref, o12_ref, pu_ref, pv_ref,
             mu_ref, mv_ref) = rest
        else:
            (o11_ref, o22_ref, o12_ref, pu_ref, pv_ref) = rest
        # corner velocity reads: pre-shifted, block-aligned
        uc = [cp_ref[b, 0] for b in range(6)]
        vc = [cp_ref[b, 1] for b in range(6)]
        if include_metric:
            tl = [cp_ref[b, 2] for b in range(6)]
        press = press_ref[0]
        ss_pos = ss_ref[0] > 0.0

        n11 = [None] * 6
        n22 = [None] * 6
        n12 = [None] * 6
        for g in range(6):
            e11 = uc[0] * bg_ref[0, 0, g]
            e22 = vc[0] * bg_ref[0, 1, g]
            exy = uc[0] * bg_ref[0, 1, g] + vc[0] * bg_ref[0, 0, g]
            for b in range(1, 6):
                e11 = e11 + uc[b] * bg_ref[b, 0, g]
                e22 = e22 + vc[b] * bg_ref[b, 1, g]
                exy = exy + uc[b] * bg_ref[b, 1, g] + \
                    vc[b] * bg_ref[b, 0, g]
            e12 = 0.5 * exy
            if include_metric:
                e11 = e11 - vc[g] * tl[g]
                e12 = e12 + 0.5 * uc[g] * tl[g]
            div = e11 + e22
            tension = e11 - e22
            shearing = 2.0 * e12
            delta = jnp.sqrt(div * div + (tension * tension +
                                          shearing * shearing) / ecc2)
            s11 = t11_ref[g]
            s22 = t22_ref[g]
            s12 = t12_ref[g]
            stress1 = s11 + s22
            stress2 = s11 - s22
            p_coeff = press / jnp.maximum(delta, puny) * p_scale
            stress1 = (stress1 + p_coeff * (div - delta)) / denom_c
            stress2 = (stress2 + (p_coeff / ecc2) * tension) / denom_c
            m12 = (s12 + (p_coeff / ecc2) * shearing * 0.5) / denom_c
            m11 = 0.5 * (stress1 + stress2)
            m22 = 0.5 * (stress1 - stress2)
            n11[g] = jnp.where(ss_pos, m11, s11)
            n22[g] = jnp.where(ss_pos, m22, s22)
            n12[g] = jnp.where(ss_pos, m12, s12)
            o11_ref[g] = n11[g]
            o22_ref[g] = n22[g]
            o12_ref[g] = n12[g]

        for j in range(6):
            pu = n11[0] * bi_ref[0, 0, j] + n12[0] * bi_ref[0, 1, j]
            pv = n22[0] * bi_ref[0, 1, j] + n12[0] * bi_ref[0, 0, j]
            for s in range(1, 6):
                pu = pu + n11[s] * bi_ref[s, 0, j] + \
                    n12[s] * bi_ref[s, 1, j]
                pv = pv + n22[s] * bi_ref[s, 1, j] + \
                    n12[s] * bi_ref[s, 0, j]
            pu_ref[j] = pu
            pv_ref[j] = pv
            if include_metric:
                mu = n12[0] * bm_ref[0, j]
                mv = n11[0] * bm_ref[0, j]
                for s in range(1, 6):
                    mu = mu + n12[s] * bm_ref[s, j]
                    mv = mv + n11[s] * bm_ref[s, j]
                mu_ref[j] = mu
                mv_ref[j] = mv

    cpb = pl.BlockSpec((6, F, B), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((6, B), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    oneb = pl.BlockSpec((1, B), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    bgs = pl.BlockSpec((6, 2, 6, B), lambda i: (0, 0, 0, i),
                       memory_space=pltpu.VMEM)
    bms = pl.BlockSpec((6, 6, B), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)

    @jax.jit
    def run(corner_planes, t11, t22, t12, press, ss,
            basis_grad, basis_int, basis_metric):
        dt = t11.dtype

        def padc(a):
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) +
                           [(0, npc_pad - npc)])

        n_out = 7 if include_metric else 5
        in_specs = [cpb, sblk, sblk, sblk, oneb, oneb, bgs, bgs]
        args = [corner_planes, padc(t11), padc(t22), padc(t12),
                padc(press[None, :]), padc(ss[None, :]),
                padc(basis_grad), padc(basis_int)]
        if include_metric:
            in_specs.append(bms)
            args.append(padc(basis_metric))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((6, npc_pad), dt)
                for _ in range(n_out)),
            in_specs=in_specs,
            out_specs=(sblk,) * n_out,
            interpret=interpret,
        )(*args)
        outs = [o[..., :npc] for o in outs]
        if include_metric:
            return tuple(outs)
        t11n, t22n, t12n, pu, pv = outs
        return t11n, t22n, t12n, pu, pv, None, None

    return run, npc_pad
