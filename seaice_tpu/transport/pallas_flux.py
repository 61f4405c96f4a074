"""Fused Pallas kernel for IR flux integration.

The polynomial-coefficient flux integration (`remap.integrate_fluxes`,
the TPU redesign of the reference's
`integrate_fluxes_over_triangles`, `mpas_seaice_advection_incremental_
remap.F:6667-6982`) is the hottest kernel of the full-physics step:
at QU120km scale it is ~165 ms of a ~415 ms step when expressed as
XLA ops, because every intermediate is a [nEdges*slots, nCat, nKeys]
array whose tiny trailing dims the TPU pads to (8, 128) tiles — >90%
of the memory traffic is padding.

This kernel keeps the ONE large XLA gather (coefficients of all
tracers for each (edge, slot) source cell, [X, F] with F ~ 600 flat —
lane-efficient) and fuses EVERYTHING after it into a single blocked
Pallas pass where all intermediates live in VMEM:

  per row block [B, F] (B = S*K rows = K whole edges):
    1. Wa_exp = Wa_blk @ SelM0            (monomial -> column map, MXU)
    2. P      = g_blk * Wa_exp            (quadrature fold, VPU)
    3. Pf     = Fold @ P                  (slot sum, 0/1 MXU matmul)
    4. out2d  = Pf @ Sel2d                (per-tracer column sum, MXU)
    5. parent partials P0/Px/Py = (gpar * wa-shift) @ SelP   (MXU)
    6. 3D integrands c3*rep(P0) + gx3*rep(Px) + gy3*rep(Py)  (VPU,
       rep and the c3/gx3/gy3 column extractions as 0/1 MXU matmuls),
       slot-summed with Fold.

All reshapes/slot-sums/column-selections are expressed as static 0/1
matmuls on the MXU — nothing ever leaves VMEM between the gather read
and the [K, nTracerCols] flux output, so the pass streams the gathered
coefficients from HBM exactly once.

Numerics match `remap.integrate_fluxes` up to float reduction
reassociation (matmul accumulation order); asserted in
`tests/test_remap.py::test_pallas_flux_matches_xla`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import RemapTensors
from .remap import _poly_mul_linear, triangle_monomial_integrals


def _pack_plan(tree, recon, term_idx):
    """Static packing of all tracers' cellwise polynomial coefficients
    into one flat column space (mirrors `remap.integrate_fluxes`),
    plus the column metadata every selector matrix is built from."""
    polys = {}
    cat = []                 # cellwise arrays to concatenate
    col_mono = []            # per column: monomial index (-1: 3D block)
    off = 0
    out2d = []               # (name, nCat, out_off)
    n_out2d = 0
    sel2d_rows = []          # (col, out_col)
    specs3d = []             # (name, nCat, nL, col_off, out3_off)
    block_off = {}
    keys_of = {}
    t3 = 0
    for spec in tree.specs:
        r = recon[spec.name]
        c0, gx, gy = r["center"], r["gx"], r["gy"]
        if c0.ndim == 2:
            if spec.parent is None:
                poly = {(0, 0): c0, (1, 0): gx, (0, 1): gy}
            else:
                poly = _poly_mul_linear(polys[spec.parent], c0, gx, gy)
            polys[spec.name] = poly
            keys = sorted(poly.keys(), key=lambda m: term_idx[m])
            keys_of[spec.name] = keys
            nCat = c0.shape[1]
            coeff = jnp.stack([poly[k] for k in keys], axis=-1)
            cat.append(coeff.reshape(coeff.shape[0], -1))
            block_off[spec.name] = off
            for cc in range(nCat):
                for j, k in enumerate(keys):
                    col_mono.append(term_idx[k])
                    sel2d_rows.append((off + cc * len(keys) + j,
                                       n_out2d + cc))
            out2d.append((spec.name, nCat, n_out2d))
            n_out2d += nCat
            off += nCat * len(keys)
        else:
            nCat, nL = c0.shape[1], c0.shape[2]
            specs3d.append((spec.name, nCat, nL, off, t3))
            block_off[spec.name] = off
            for a in (c0, gx, gy):
                cat.append(a.reshape(a.shape[0], -1))
            col_mono += [-1] * (3 * nCat * nL)
            off += 3 * nCat * nL
            t3 += nCat * nL
    return dict(polys=polys, cat=cat, col_mono=col_mono, F=off,
                out2d=out2d, n_out2d=n_out2d, sel2d_rows=sel2d_rows,
                specs3d=specs3d, block_off=block_off, keys_of=keys_of,
                T3=t3)


def _build_kernel(plan, tree, term_idx, S, K, Mw, dtype, interpret):
    """Build the pallas_call.

    Rows are (edge, k) pairs over the K6 = S cell slots of the edge
    stencil (slot-folded OUTSIDE the kernel — see
    `integrate_fluxes_fused`).  The gathered coefficients arrive
    SUBLANE-PACKED as [B, 8, L] blocks (one full (8, 128)-tile per row
    when L = 128) and are unpacked to [B, F8] lanes in VMEM; every 0/1
    column-selection that used to be an MXU matmul over the F-wide axis
    is a static lane slice (the packed column layout is contiguous per
    tracer block), leaving only genuinely contracting matmuls on the
    MXU."""
    F = plan["F"]
    T2 = plan["n_out2d"]
    T3 = max(plan["T3"], 1)
    has3d = plan["T3"] > 0
    B = S * K
    L = 128 * (-(-F // 1024))            # lanes per sublane chunk
    F8 = 8 * L
    npdt = np.dtype(jnp.dtype(dtype).name)

    assert Mw <= 128, "monomial term count exceeds one lane tile"
    # monomial -> column expansion as an exact lane shuffle: out[b, f]
    # = wa[b, col_mono[f]] (masked 0 for 3D blocks / padding).  A 0/1
    # matmul here would either bf16-truncate wa (DEFAULT precision)
    # or cost 6 MXU passes (HIGHEST); the shuffle is exact at any
    # dtype and runs on the VPU.
    mono_idx = np.zeros((1, F8), np.int32)
    mono_mask = np.zeros((1, F8), npdt)
    for f, m in enumerate(plan["col_mono"]):
        if m >= 0:
            mono_idx[0, f] = m
            mono_mask[0, f] = 1.0
    sel2d = np.zeros((F8, T2), npdt)
    for f, t in plan["sel2d_rows"]:
        sel2d[f, t] = 1.0

    mats3d = []
    for (name, nCat, nL, o, t3o) in plan["specs3d"]:
        spec = tree.spec(name)
        pkeys = plan["keys_of"][spec.parent]
        Mp = len(pkeys)
        poff = plan["block_off"][spec.parent]
        CP = nCat * Mp
        assert CP <= 128
        w0i = np.zeros((1, 128), np.int32)
        wxi = np.zeros((1, 128), np.int32)
        wyi = np.zeros((1, 128), np.int32)
        for cc in range(nCat):
            for j, k in enumerate(pkeys):
                col = cc * Mp + j
                w0i[0, col] = term_idx[k]
                wxi[0, col] = term_idx[(k[0] + 1, k[1])]
                wyi[0, col] = term_idx[(k[0], k[1] + 1)]
        selp = np.zeros((CP, nCat), npdt)
        for cc in range(nCat):
            selp[cc * Mp:(cc + 1) * Mp, cc] = 1.0
        rep = np.zeros((nCat, nCat * nL), npdt)
        for cc in range(nCat):
            rep[cc, cc * nL:(cc + 1) * nL] = 1.0
        F3 = nCat * nL
        mats3d.append(dict(F3=F3, t3_off=t3o, col_off=o, poff=poff,
                           CP=CP, mats=[w0i, wxi, wyi, selp, rep]))
    N_MATS3 = 5

    pet = dtype

    def kernel(g_ref, wa_ref, mono_idx_ref, mono_mask_ref, sel2d_ref,
               *refs):
        n3 = len(mats3d)
        m3_refs = refs[:N_MATS3 * n3]
        out2d_ref = refs[N_MATS3 * n3]
        out3d_ref = refs[N_MATS3 * n3 + 1] if has3d else None
        # unpack sublane chunks -> [B, F8] lanes
        g = jnp.concatenate([g_ref[:, s, :] for s in range(8)],
                            axis=-1)
        wa = wa_ref[:]                                   # [B, Mw]
        wa128 = jnp.concatenate(
            [wa, jnp.zeros((B, 128 - Mw), pet)], axis=1) \
            if Mw < 128 else wa

        def lane_gather(idx_row):
            # idx_row [1, 128] i32 -> [B, 128] lane shuffle of wa
            idxb = jnp.broadcast_to(idx_row, (B, 128))
            return jnp.take_along_axis(wa128, idxb, axis=1)

        wa_exp = jnp.concatenate(
            [lane_gather(mono_idx_ref[:, c * 128:(c + 1) * 128])
             for c in range(F8 // 128)], axis=1) * mono_mask_ref[:]
        P = g * wa_exp
        # the slot fold (sum of S consecutive rows per edge) as a
        # sublane-reshape reduction — exact, VPU
        Pf = P.reshape(K, S, F8).sum(axis=1)             # [K, F8]
        # genuinely contracting 0/1 reductions stay on the MXU at
        # HIGHEST (f32-exact selection; tiny output dims)
        out2d_ref[:] = jnp.dot(Pf, sel2d_ref[:],
                               preferred_element_type=pet,
                               precision=jax.lax.Precision.HIGHEST)
        for i3, m in enumerate(mats3d):
            (w0i_ref, wxi_ref, wyi_ref, selp_ref, rep_ref) = \
                m3_refs[N_MATS3 * i3:N_MATS3 * (i3 + 1)]
            po, CP, o, F3 = m["poff"], m["CP"], m["col_off"], m["F3"]
            gpar = g[:, po:po + CP]                      # [B, CP] slice
            w0 = lane_gather(w0i_ref[:])[:, :CP]
            wx = lane_gather(wxi_ref[:])[:, :CP]
            wy = lane_gather(wyi_ref[:])[:, :CP]
            P0 = jnp.dot(gpar * w0, selp_ref[:],
                         preferred_element_type=pet,
                         precision=jax.lax.Precision.HIGHEST)
            Px = jnp.dot(gpar * wx, selp_ref[:],
                         preferred_element_type=pet,
                         precision=jax.lax.Precision.HIGHEST)
            Py = jnp.dot(gpar * wy, selp_ref[:],
                         preferred_element_type=pet,
                         precision=jax.lax.Precision.HIGHEST)
            c3 = g[:, o:o + F3]                          # slices
            gx3 = g[:, o + F3:o + 2 * F3]
            gy3 = g[:, o + 2 * F3:o + 3 * F3]
            P0r = jnp.dot(P0, rep_ref[:], preferred_element_type=pet,
                          precision=jax.lax.Precision.HIGHEST)
            Pxr = jnp.dot(Px, rep_ref[:], preferred_element_type=pet,
                          precision=jax.lax.Precision.HIGHEST)
            Pyr = jnp.dot(Py, rep_ref[:], preferred_element_type=pet,
                          precision=jax.lax.Precision.HIGHEST)
            integ = c3 * P0r + gx3 * Pxr + gy3 * Pyr     # [B, F3]
            out3d_ref[:, m["t3_off"]:m["t3_off"] + m["F3"]] = \
                integ.reshape(K, S, F3).sum(axis=1)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((B, 8, L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, Mw), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const_spec((1, F8)), const_spec((1, F8)),
        const_spec((F8, T2)),
    ]
    mat_args = [jnp.asarray(mono_idx), jnp.asarray(mono_mask),
                jnp.asarray(sel2d)]
    for m in mats3d:
        for a in m["mats"]:
            in_specs.append(const_spec(a.shape))
            mat_args.append(jnp.asarray(a))

    out_specs = [pl.BlockSpec((K, T2), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if has3d:
        out_specs.append(pl.BlockSpec((K, T3), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    def run(g, wa, n_blocks):
        out_shape = [jax.ShapeDtypeStruct((n_blocks * K, T2), dtype)]
        if has3d:
            out_shape.append(
                jax.ShapeDtypeStruct((n_blocks * K, T3), dtype))
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(g, wa, *mat_args)

    return run, has3d, L


def integrate_fluxes_fused(tree, recon, rt: RemapTensors, cell_slot,
                           xq, yq, area, mask_edge,
                           interpret: Optional[bool] = None,
                           K: int = 64):
    """Drop-in replacement for `remap.integrate_fluxes` backed by the
    fused Pallas pass.

    cell_slot [nE, S]: per-triangle index into the edge's K6-cell remap
    stencil (`tris["cell_slot"]`).  The S triangle slots are FOLDED
    onto the K6 stencil axis before the gather — the monomial weights
    Wa of all slots sourcing the same stencil cell are summed first
    (exact reassociation: the coefficients are identical), so the
    coefficient gather runs over nE*K6 rows instead of nE*S.  The
    gather itself is sublane-packed: the [nc, F] coefficient table is
    reshaped to [nc, 8, L] so one gathered row fills whole (8, 128)
    tiles instead of one sublane of five."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nE, S = cell_slot.shape
    K6 = rt.cells_on_edge_remap.shape[1]
    dtype = xq.dtype
    max_depth = max(tree.depth(s.name) for s in tree.specs)
    mom, terms = triangle_monomial_integrals(rt, xq, yq,
                                             max_degree=max_depth + 1)
    term_idx = {m: i for i, m in enumerate(terms)}
    M = len(terms)
    plan = _pack_plan(tree, recon, term_idx)

    # fold triangle slots onto the K6 stencil axis
    hi = jax.lax.Precision.HIGHEST
    oh = (cell_slot[..., None] ==
          jnp.arange(K6, dtype=cell_slot.dtype)).astype(dtype)
    Wa_s = mom.reshape(nE, S, M) * area[..., None]       # [nE, S, M]
    Wa6 = jnp.einsum("esk,esm->ekm", oh, Wa_s,
                     precision=hi)                       # [nE, K6, M]
    Wa6 = Wa6 * rt.cells_on_edge_remap_mask[..., None]
    X = nE * K6
    Wa = Wa6.reshape(X, M)
    cellf = jnp.maximum(rt.cells_on_edge_remap, 0).reshape(-1)

    # sublane-packed coefficient gather
    C = jnp.concatenate(plan["cat"], axis=1)             # [nc, F]
    F = plan["F"]
    L = 128 * (-(-F // 1024))
    F8 = 8 * L
    if F8 > F:
        C = jnp.pad(C, ((0, 0), (0, F8 - F)))
    gathered = C.reshape(C.shape[0], 8, L)[cellf]        # [X, 8, L]

    B = K6 * K
    n_blocks = -(-X // B)
    pad = n_blocks * B - X
    if pad:
        gathered = jnp.pad(gathered, ((0, pad), (0, 0), (0, 0)))
        Wa = jnp.pad(Wa, ((0, pad), (0, 0)))    # zero Wa rows: no flux

    run, has3d, _L = _build_kernel(plan, tree, term_idx, K6, K, M,
                                   dtype, interpret)
    outs = run(gathered, Wa, n_blocks)
    flux2d = outs[0][:nE]
    me = mask_edge[:, None]
    fluxes = {}
    for (name, nCat, o) in plan["out2d"]:
        fluxes[name] = flux2d[:, o:o + nCat] * me
    if has3d:
        flux3d = outs[1][:nE]
        for (name, nCat, nL, _, t3o) in plan["specs3d"]:
            fluxes[name] = flux3d[:, t3o:t3o + nCat * nL].reshape(
                nE, nCat, nL) * me[..., None]
    return fluxes
