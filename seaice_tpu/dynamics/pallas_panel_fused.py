"""Fully-fused Pallas EVP solver for icosahedral panel meshes.

One `pallas_call` runs the ENTIRE elastic subcycle loop (reference
`mpas_seaice_velocity_solver.F:2447-2592`: strain -> constitutive ->
stress divergence -> ocean drag -> 2x2 implicit momentum solve, x120)
with every operand VMEM-resident: the per-cell Wachspress basis
(~30 MB packed), the velocity/stress state, and the momentum
invariants are read from HBM once per SOLVE, not once per subcycle.
The v5e exposes >100 MB of VMEM, so unlike `pallas_panel.py` (which
streams the basis block-wise every subcycle and leaves the vertex-side
work to XLA at one kernel launch per subcycle) nothing is re-streamed
and there is exactly one launch per velocity solve.

TPU-native design:
  * 2-D plane layout [1 + 10*(N+1) + 1 (guard rows), 128 lanes]: panel
    p, lattice a at row 1 + p*(N+1) + a; cells occupy lanes j<N,
    vertices lanes j+1 <= N.  Corner gathers and dual scatters become
    static sublane/lane rolls of whole planes (the panel-shift
    formulation of variational_panel.py, now inside the kernel).
  * Seam ghosts: every per-subcycle ghost refresh is an affine,
    TRANSPOSED strip copy between two panels (panel_strips.py).  A
    gather is unavailable in-kernel; instead strips are batched and
    transposed by one small MXU matmul against an identity (reversed
    runs: an anti-identity) — dot_general contracting dim 0 is a
    native transposed-operand matmul.
  * The basis pair-packs slots (g, g+3) into lane halves [0:64),
    [64:128) so the 65-lane panels don't waste half of every VMEM
    tile: 30 MB instead of 60 MB resident.
  * The 12 exception cells (poles + panel-corner pentagons) carry
    their stress state in a tiny side buffer and are handled by
    static scalar gathers/scatter-adds — 12 cells against 40k.

Numerics are identical to the XLA panel path up to float reduction
reassociation; `tests/test_panel_fused.py` asserts trajectory
agreement against the XLA oracle in interpret mode, and the TPU run is
cross-checked against the same oracle by `tests/test_pallas_panel.py`
conventions.  Eligibility: standard EVP, quadratic ocean stress,
single device, f32-on-TPU (interpret mode at any dtype), N <= 64.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as c
from ..mesh.panels import CORNER_OFFSETS
from .variational_panel import DUAL_OFFSETS, PanelTensors, _vertex_planes
from .panel_strips import (StripRun, build_pu_strip_runs,
                           build_vertex_strip_runs)

LANES = 128


def _row_of(N: int, p: int, a: int) -> int:
    return 1 + p * (N + 1) + a


def _roll(x, shift: int, axis: int):
    """Static circular shift; out[i] = x[i - shift]."""
    shift = shift % x.shape[axis]
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis)


def _shift_plane(x, da: int, db: int):
    """z[r, l] = x[r + da, l + db] (wrapped entries land only in guard
    rows / pad lanes, which no real consumer reads)."""
    z = _roll(x, -db, 1) if db else x
    if da:
        z = _roll(z, -da, 0)
    return z


def _apply_strip_stores(values: List, store, runs: List[StripRun],
                        N: int, eye, jay):
    """Refresh ghost strips from their owner positions: read from the
    plane VALUES (sources are interior positions, never ghost
    destinations), write through `store(plane_idx, kind, row, col,
    strip)` — Mosaic permits mutation only through refs.  All runs are
    transposed copies; each (dst kind, reversed, length) group's
    transposition is one small MXU matmul against eye / jay.  'col'
    groups run first so 'row' wins at shared corners."""
    groups = {}
    for r in runs:
        groups.setdefault((r.dst_kind, r.reversed_src, r.n), []).append(r)
    for kind in ("col", "row"):
        for (k_, rev, n), rs in sorted(
                (g for g in groups.items() if g[0][0] == kind),
                key=lambda g: (g[0][1], g[0][2])):
            M = jay[jay.shape[0] - n:, :n] if rev else eye[:n, :n]
            K = len(rs)
            assert K <= eye.shape[0]
            if kind == "row":
                # src strips vary along a (columns of the src plane).
                # Mosaic cannot concatenate slices with mismatched
                # sublane offsets, so the [n, K] batch is assembled by
                # one-hot outer products instead of a concat.
                C = None
                for k, r in enumerate(rs):
                    a_lo = r.src_a0 + (n - 1) * r.src_da \
                        if r.src_da < 0 else r.src_a0
                    r0 = _row_of(N, r.src_panel, a_lo)
                    col = values[r.src_plane][r0:r0 + n,
                                              r.src_b0:r.src_b0 + 1]
                    piece = col * eye[k:k + 1, :K]         # [n, K]
                    C = piece if C is None else C + piece
                T = jax.lax.dot_general(
                    C, M, (((0,), (0,)), ((), ())),
                    preferred_element_type=C.dtype,
                    precision=jax.lax.Precision.HIGHEST)   # [K, n]
                for k, r in enumerate(rs):
                    dr = _row_of(N, r.dst_panel, r.dst_fixed)
                    store(r.dst_plane, "row", dr, r.dst_lo,
                          T[k:k + 1])                      # [1, n]
            else:
                # src strips vary along b (rows of the src plane)
                R = None
                for k, r in enumerate(rs):
                    b_lo = r.src_b0 + (n - 1) * r.src_db \
                        if r.src_db < 0 else r.src_b0
                    r0 = _row_of(N, r.src_panel, r.src_a0)
                    row = values[r.src_plane][r0:r0 + 1, b_lo:b_lo + n]
                    piece = row * eye[:K, k:k + 1]         # [K, n]
                    R = piece if R is None else R + piece
                Ct = jax.lax.dot_general(
                    M, R, (((1,), (1,)), ((), ())),
                    preferred_element_type=R.dtype,
                    precision=jax.lax.Precision.HIGHEST)   # [n, K]
                for k, r in enumerate(rs):
                    r0 = _row_of(N, r.dst_panel, r.dst_lo)
                    store(r.dst_plane, "col", r0, r.dst_fixed,
                          Ct[:, k:k + 1])                  # [n, 1]


def build_fused_panel_solver(mesh, lay, *, dt_elastic: float,
                             damping_timescale: float,
                             n_subcycles: int, include_metric: bool,
                             interpret: Optional[bool] = None):
    """Build fn(pt, u, v, s11T, s22T, s12T, pressure, solve_stress,
    uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0, ocean_u, ocean_v,
    solve_velocity, area_vertex) -> (u, v, s11T, s22T, s12T)

    with u/v/... [nVertices], s**T ring-indexed [maxEdges, nCells],
    pt the PanelTensors.  Everything mesh-static is baked in at build
    time from `lay`/`mesh` (NumPy); everything traced flows through
    the arguments.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = int(lay.N)
    if N > 64:
        raise ValueError("fused panel kernel supports N <= 64 "
                         f"(panel size {N}); VMEM cannot hold the "
                         "basis at larger sizes")
    R = N + 1
    RT = 1 + 10 * R + 1
    RT8 = ((RT + 7) // 8) * 8
    npp = 10 * R * R
    n_sub = int(n_subcycles)

    dte = float(dt_elastic)
    denom_c = 1.0 + (0.5 * dte) / float(damping_timescale)
    p_scale = dte / (2.0 * float(damping_timescale))
    ecc2 = float(c.EVP_ECCENTRICITY_SQ)
    puny = float(c.PUNY)
    cosw = float(c.COS_OCEAN_TURNING_ANGLE)
    sinw = float(c.SIN_OCEAN_TURNING_ANGLE)
    drag = float(c.ICE_OCEAN_DRAG * c.DENSITY_SEAWATER)

    # static schedules
    corner_shifts = [(di - 1, dj + 1, t) for (di, dj, t) in
                     CORNER_OFFSETS]
    dual_terms = {t: [(di + 1, dj - 1, slot) for (di, dj, slot) in
                      DUAL_OFFSETS[t]] for t in (0, 1)}
    vert_runs = build_vertex_strip_runs(lay, N)
    pu_runs = build_pu_strip_runs(lay, N)

    def _max_group(runs):
        gs = {}
        for r in runs:
            k = (r.dst_kind, r.reversed_src, r.n)
            gs[k] = gs.get(k, 0) + 1
        return max(gs.values())

    # the identity/anti-identity must cover both the strip length and
    # the largest per-group batch size
    np_need = max(N + 1, _max_group(vert_runs), _max_group(pu_runs), 16)

    # exception-cell static geometry: ring vertex plane coords
    exc = np.asarray(lay.exception_cells)
    voc = np.asarray(mesh.vertices_on_cell)[exc]          # [12, me]
    neoc = np.asarray(mesh.n_edges_on_cell)[exc]
    exc_valid = (np.arange(mesh.max_edges)[None, :] < neoc[:, None]) \
        & (voc >= 0)
    voc0 = np.where(exc_valid, voc, 0)
    t_e = voc0 % 2
    q = voc0 // 2
    j_e = q % N
    a_e = (q // N) % N
    p_e = q // (N * N)
    exc_rows = 1 + p_e * R + a_e                          # [12, me]
    exc_lanes = j_e + 1
    me = int(mesh.max_edges)
    n_exc = len(exc)

    NP8 = ((np_need + 7) // 8) * 8

    def kernel(bgp_r, bip_r, bmp_r, press_r, ss_r, inv_r, eye_r, jay_r,
               ebg_r, ebi_r, ebm_r, eps_r, emask_r, etle_r,
               u_in, v_in, t11_in, t22_in, t12_in, texc_in,
               u_o, v_o, t11_o, t22_o, t12_o, texc_o,
               pu_s, pv_s, mu_s, mv_s, dd_s):
        dt = u_in.dtype
        eye = eye_r[:]
        jay = jay_r[:]

        # seed the outputs from the inputs explicitly: the subcycle loop
        # reads the output refs as its running state, and the TPU
        # lowering does not guarantee aliased outputs read back the
        # input values before the first write (interpret mode does);
        # the input_output_aliases remain as a buffer-reuse hint only
        u_o[:] = u_in[:]
        v_o[:] = v_in[:]
        t11_o[:] = t11_in[:]
        t22_o[:] = t22_in[:]
        t12_o[:] = t12_in[:]
        texc_o[:] = texc_in[:]

        # zero the partial-product scratch once: the compute pass only
        # writes cell lanes [0:64); ghost strips write lane N; all
        # other lanes must read as zero in the dual shifts
        zfull = jnp.zeros((RT8, LANES), dt)
        for j in range(6):
            pu_s[j] = zfull
            pv_s[j] = zfull
            mu_s[j] = zfull
            mv_s[j] = zfull

        def half(x, hi):
            return x[:, 64:128] if hi else x[:, 0:64]

        press64 = press_r[:][:, 0:64]
        ss_pos = ss_r[:][:, 0:64] > 0.0

        # invariant vertex fields as [2, RT8, 128] values
        def invf(k):
            return [inv_r[k, 0], inv_r[k, 1]]
        uo = invf(0)
        vo = invf(1)
        mv = invf(2)
        mf = invf(3)
        rhs_u0 = invf(4)
        rhs_v0 = invf(5)
        ocn_u = invf(6)
        ocn_v = invf(7)
        sv = invf(8)
        areav = invf(9)
        inv_den = invf(10)
        tl = invf(11)
        sgn_f = [jnp.where(x >= 0.0, 1.0, -1.0).astype(dt) for x in mf]
        sv_pos = [x > 0.0 for x in sv]

        # exception constants — all 2-D [1, 16] (Mosaic has no 1-D ops)
        e_press = eps_r[0:1, :]
        e_ss = eps_r[1:2, :] > 0.0
        egx = [[ebg_r[b, 0, g:g + 1, :] for g in range(me)]
               for b in range(me)]
        egy = [[ebg_r[b, 1, g:g + 1, :] for g in range(me)]
               for b in range(me)]
        ebu = [[ebi_r[s, 0, j:j + 1, :] for j in range(me)]
               for s in range(me)]
        ebv = [[ebi_r[s, 1, j:j + 1, :] for j in range(me)]
               for s in range(me)]
        ebm = [[ebm_r[s, j:j + 1, :] for j in range(me)]
               for s in range(me)]
        emk = [emask_r[b:b + 1, :] for b in range(me)]
        etl = [etle_r[b:b + 1, :] for b in range(me)]

        # pre-shifted tan(lat)/r corner planes (loop-invariant)
        if include_metric:
            tlc64 = [
                _shift_plane(tl[t], da, db)[:, 0:64]
                for (da, db, t) in corner_shifts]

        def body(_, carry):
            u_t = [u_o[0], u_o[1]]
            v_t = [v_o[0], v_o[1]]

            # --- corner velocity planes (static shifts) ---
            uc = [_shift_plane(u_t[t], da, db)[:, 0:64]
                  for (da, db, t) in corner_shifts]
            vc = [_shift_plane(v_t[t], da, db)[:, 0:64]
                  for (da, db, t) in corner_shifts]

            # --- strain -> EVP stress relaxation per corner slot ---
            n11 = [None] * 6
            n22 = [None] * 6
            n12 = [None] * 6
            for g in range(6):
                hi = g >= 3
                gm = g % 3
                e11 = uc[0] * half(bgp_r[0, 0, gm], hi)
                e22 = vc[0] * half(bgp_r[0, 1, gm], hi)
                exy = uc[0] * half(bgp_r[0, 1, gm], hi) + \
                    vc[0] * half(bgp_r[0, 0, gm], hi)
                for b in range(1, 6):
                    gx = half(bgp_r[b, 0, gm], hi)
                    gy = half(bgp_r[b, 1, gm], hi)
                    e11 = e11 + uc[b] * gx
                    e22 = e22 + vc[b] * gy
                    exy = exy + uc[b] * gy + vc[b] * gx
                e12 = 0.5 * exy
                if include_metric:
                    e11 = e11 - vc[g] * tlc64[g]
                    e12 = e12 + 0.5 * uc[g] * tlc64[g]
                div = e11 + e22
                tension = e11 - e22
                shearing = 2.0 * e12
                delta = jnp.sqrt(div * div + (tension * tension +
                                              shearing * shearing) / ecc2)
                s11 = t11_o[g]
                s22 = t22_o[g]
                s12 = t12_o[g]
                stress1 = s11 + s22
                stress2 = s11 - s22
                p_coeff = press64 / jnp.maximum(delta, puny) * p_scale
                stress1 = (stress1 + p_coeff * (div - delta)) / denom_c
                stress2 = (stress2 + (p_coeff / ecc2) * tension) / denom_c
                m12 = (s12 + (p_coeff / ecc2) * shearing * 0.5) / denom_c
                m11 = 0.5 * (stress1 + stress2)
                m22 = 0.5 * (stress1 - stress2)
                n11[g] = jnp.where(ss_pos, m11, s11)
                n22[g] = jnp.where(ss_pos, m22, s22)
                n12[g] = jnp.where(ss_pos, m12, s12)
                t11_o[g] = n11[g]
                t22_o[g] = n22[g]
                t12_o[g] = n12[g]

            # --- divergence partial products per dual slot ---
            for j in range(6):
                hi = j >= 3
                jm = j % 3
                a_u = n11[0] * half(bip_r[0, 0, jm], hi) + \
                    n12[0] * half(bip_r[0, 1, jm], hi)
                a_v = n22[0] * half(bip_r[0, 1, jm], hi) + \
                    n12[0] * half(bip_r[0, 0, jm], hi)
                for s in range(1, 6):
                    bu = half(bip_r[s, 0, jm], hi)
                    bv = half(bip_r[s, 1, jm], hi)
                    a_u = a_u + n11[s] * bu + n12[s] * bv
                    a_v = a_v + n22[s] * bv + n12[s] * bu
                pu_s[j, :, 0:64] = a_u
                pv_s[j, :, 0:64] = a_v
                if include_metric:
                    a_mu = n12[0] * half(bmp_r[0, jm], hi)
                    a_mv = n11[0] * half(bmp_r[0, jm], hi)
                    for s in range(1, 6):
                        bm_ = half(bmp_r[s, jm], hi)
                        a_mu = a_mu + n12[s] * bm_
                        a_mv = a_mv + n11[s] * bm_
                    mu_s[j, :, 0:64] = a_mu
                    mv_s[j, :, 0:64] = a_mv

            # --- seam ghost strips of the partials (ref stores) ---
            def strip_store(ref):
                def f(plane, kind, r0, c0, strip):
                    if kind == "row":
                        ref[plane, r0:r0 + 1,
                            c0:c0 + strip.shape[1]] = strip
                    else:
                        ref[plane, r0:r0 + strip.shape[0],
                            c0:c0 + 1] = strip
                return f

            fields = [(pu_s, True), (pv_s, True),
                      (mu_s, include_metric), (mv_s, include_metric)]
            for ref, on in fields:
                if on:
                    vals = [ref[j] for j in range(6)]
                    _apply_strip_stores(vals, strip_store(ref),
                                        pu_runs, N, eye, jay)

            # --- dual accumulation (static shifts) ---
            g_pu = [None, None]
            g_pv = [None, None]
            g_mu = [None, None]
            g_mv = [None, None]
            pu2 = [pu_s[j] for j in range(6)]
            pv2 = [pv_s[j] for j in range(6)]
            if include_metric:
                mu2 = [mu_s[j] for j in range(6)]
                mv2 = [mv_s[j] for j in range(6)]
            for t in (0, 1):
                su = sv_ = smu = smv = None
                for (da, db, slot) in dual_terms[t]:
                    xu = _shift_plane(pu2[slot], da, db)
                    xv = _shift_plane(pv2[slot], da, db)
                    su = xu if su is None else su + xu
                    sv_ = xv if sv_ is None else sv_ + xv
                    if include_metric:
                        xmu = _shift_plane(mu2[slot], da, db)
                        xmv = _shift_plane(mv2[slot], da, db)
                        smu = xmu if smu is None else smu + xmu
                        smv = xmv if smv is None else smv + xmv
                g_pu[t] = su
                g_pv[t] = sv_
                g_mu[t] = smu
                g_mv[t] = smv

            # --- exception cells (poles + pentagons) ---
            # ring-indexed gather of u/v at static plane positions,
            # built as [1, 16] lane vectors (no 1-D ops in Mosaic)
            ue = [None] * me
            ve = [None] * me
            for b in range(me):
                au = av = None
                for e in range(n_exc):
                    if not exc_valid[e, b]:
                        continue
                    t0 = int(t_e[e, b])
                    r0 = int(exc_rows[e, b])
                    l0 = int(exc_lanes[e, b])
                    oh = eye[e:e + 1, :16]
                    pu_ = u_t[t0][r0:r0 + 1, l0:l0 + 1] * oh
                    pv_ = v_t[t0][r0:r0 + 1, l0:l0 + 1] * oh
                    au = pu_ if au is None else au + pu_
                    av = pv_ if av is None else av + pv_
                ue[b] = au if au is not None else jnp.zeros((1, 16), dt)
                ve[b] = av if av is not None else jnp.zeros((1, 16), dt)
            x11 = [None] * me
            x22 = [None] * me
            x12 = [None] * me
            for g in range(me):
                a11_ = ue[0] * egx[0][g]
                a22_ = ve[0] * egy[0][g]
                axy = ue[0] * egy[0][g] + ve[0] * egx[0][g]
                for b in range(1, me):
                    a11_ = a11_ + ue[b] * egx[b][g]
                    a22_ = a22_ + ve[b] * egy[b][g]
                    axy = axy + ue[b] * egy[b][g] + ve[b] * egx[b][g]
                x12g = 0.5 * axy
                if include_metric:
                    a11_ = a11_ - ve[g] * emk[g] * etl[g]
                    x12g = x12g + 0.5 * ue[g] * emk[g] * etl[g]
                x11[g] = a11_
                x22[g] = a22_
                x12[g] = x12g
            en11 = [None] * me
            en22 = [None] * me
            en12 = [None] * me
            for g in range(me):
                s11 = texc_o[0, g:g + 1, :]
                s22 = texc_o[1, g:g + 1, :]
                s12 = texc_o[2, g:g + 1, :]
                div = x11[g] + x22[g]
                tension = x11[g] - x22[g]
                shearing = 2.0 * x12[g]
                delta = jnp.sqrt(div * div + (tension * tension +
                                              shearing * shearing) / ecc2)
                stress1 = s11 + s22
                stress2 = s11 - s22
                p_coeff = e_press / jnp.maximum(delta, puny) * p_scale
                stress1 = (stress1 + p_coeff * (div - delta)) / denom_c
                stress2 = (stress2 + (p_coeff / ecc2) * tension) / denom_c
                m12 = (s12 + (p_coeff / ecc2) * shearing * 0.5) / denom_c
                m11 = 0.5 * (stress1 + stress2)
                m22 = 0.5 * (stress1 - stress2)
                en11[g] = jnp.where(e_ss, m11, s11)
                en22[g] = jnp.where(e_ss, m22, s22)
                en12[g] = jnp.where(e_ss, m12, s12)
                texc_o[0, g:g + 1, :] = en11[g]
                texc_o[1, g:g + 1, :] = en22[g]
                texc_o[2, g:g + 1, :] = en12[g]
            # exception divergence contributions -> scatter-add
            cu = [None] * me
            cv = [None] * me
            for j in range(me):
                a_u = en11[0] * ebu[0][j] + en12[0] * ebv[0][j]
                a_v = en22[0] * ebv[0][j] + en12[0] * ebu[0][j]
                for s in range(1, me):
                    a_u = a_u + en11[s] * ebu[s][j] + en12[s] * ebv[s][j]
                    a_v = a_v + en22[s] * ebv[s][j] + en12[s] * ebu[s][j]
                if include_metric:
                    a_mu = en12[0] * ebm[0][j]
                    a_mv = en11[0] * ebm[0][j]
                    for s in range(1, me):
                        a_mu = a_mu + en12[s] * ebm[s][j]
                        a_mv = a_mv + en11[s] * ebm[s][j]
                    cu[j] = (a_u + a_mu * etl[j]) * emk[j]
                    cv[j] = (a_v - a_mv * etl[j]) * emk[j]
                else:
                    cu[j] = a_u * emk[j]
                    cv[j] = a_v * emk[j]

            # --- momentum solve on the vertex planes ---
            u_new = [None, None]
            v_new = [None, None]
            for t in (0, 1):
                du = -g_pu[t]
                dv = -g_pv[t]
                if include_metric:
                    du = du - g_mu[t] * tl[t]
                    dv = dv + g_mv[t] * tl[t]
                # exception scatter-adds: park du/dv in scratch, one
                # read-modify-write ref store per target position
                # (Mosaic has no scatter; mutation only through refs)
                adds = {}
                for j in range(me):
                    for e in range(n_exc):
                        if exc_valid[e, j] and int(t_e[e, j]) == t:
                            key = (int(exc_rows[e, j]),
                                   int(exc_lanes[e, j]))
                            adds.setdefault(key, []).append((j, e))
                if adds:
                    dd_s[2 * t] = du
                    dd_s[2 * t + 1] = dv
                    for (r0, l0), items in sorted(adds.items()):
                        su_ = sv2 = None
                        for (j, e) in items:
                            xu = cu[j][0:1, e:e + 1]
                            xv = cv[j][0:1, e:e + 1]
                            su_ = xu if su_ is None else su_ + xu
                            sv2 = xv if sv2 is None else sv2 + xv
                        dd_s[2 * t, r0:r0 + 1, l0:l0 + 1] = \
                            dd_s[2 * t, r0:r0 + 1, l0:l0 + 1] - su_
                        dd_s[2 * t + 1, r0:r0 + 1, l0:l0 + 1] = \
                            dd_s[2 * t + 1, r0:r0 + 1, l0:l0 + 1] - sv2
                    du = dd_s[2 * t]
                    dv = dd_s[2 * t + 1]
                du = jnp.where(sv_pos[t], du * inv_den[t], 0.0)
                dv = jnp.where(sv_pos[t], dv * inv_den[t], 0.0)
                u2 = u_t[t]
                v2 = v_t[t]
                oc = drag * areav[t] * jnp.sqrt(
                    (uo[t] - u2) ** 2 + (vo[t] - v2) ** 2)
                oc = jnp.where(sv_pos[t], oc, 0.0)
                a11 = mv[t] / dte + oc * cosw
                a12 = -mf[t] - oc * sinw * sgn_f[t]
                rhs1 = du + rhs_u0[t] + oc * ocn_u[t] + mv[t] * u2 / dte
                rhs2 = dv + rhs_v0[t] + oc * ocn_v[t] + mv[t] * v2 / dte
                det = a11 * a11 + a12 * a12
                det = jnp.where(det == 0.0, 1.0, det)
                un = (a11 * rhs1 - a12 * rhs2) / det
                vn = (a11 * rhs2 + a12 * rhs1) / det
                u_new[t] = jnp.where(sv_pos[t], un, u2)
                v_new[t] = jnp.where(sv_pos[t], vn, v2)

            # --- commit, then refresh the vertex seam ghosts in place
            # (strip sources are interior positions of the committed
            # values, never ghost destinations) ---
            u_o[0] = u_new[0]
            u_o[1] = u_new[1]
            v_o[0] = v_new[0]
            v_o[1] = v_new[1]

            def vert_store(ref):
                def f(plane, kind, r0, c0, strip):
                    if kind == "row":
                        ref[plane, r0:r0 + 1,
                            c0:c0 + strip.shape[1]] = strip
                    else:
                        ref[plane, r0:r0 + strip.shape[0],
                            c0:c0 + 1] = strip
                return f

            _apply_strip_stores(u_new, vert_store(u_o), vert_runs, N,
                                eye, jay)
            _apply_strip_stores(v_new, vert_store(v_o), vert_runs, N,
                                eye, jay)
            return carry

        jax.lax.fori_loop(0, n_sub, body, 0)

    # ---- XLA wrapper: layout conversion + the single pallas_call ----

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def cells_to_planes(x_slot):
        """[K, npc] -> [K, RT8, 128] plane layout (poles dropped)."""
        K = x_slot.shape[0]
        body_ = x_slot[:, :npp].reshape(K, 10 * R, R)
        out = jnp.zeros((K, RT8, LANES), x_slot.dtype)
        return out.at[:, 1:1 + 10 * R, :R].set(body_)

    def planes_to_cells(x_pl, K):
        body_ = x_pl[:, 1:1 + 10 * R, :R].reshape(K, npp)
        return jnp.concatenate(
            [body_, jnp.zeros((K, 2), x_pl.dtype)], axis=1)

    def planes_to_vert(x_pl):
        """[2, RT8, 128] -> [nv] (interior extraction)."""
        body_ = x_pl[:, 1:1 + 10 * R, :R].reshape(2, 10, R, R)
        inner = body_[:, :, :N, 1:]                 # [2, 10, N, N]
        return jnp.moveaxis(inner, 0, 3).reshape(-1)

    def run(pt: PanelTensors, u, v, s11T, s22T, s12T, pressure,
            solve_stress, uo_v, vo_v, mass_vertex, mass_f,
            rhs_u0, rhs_v0, ocean_u, ocean_v, solve_velocity,
            area_vertex):
        """pressure / solve_stress in REAL cell layout [nCells]."""
        dt = u.dtype
        npc = pt.basis_grad_S.shape[-1]

        def vert_to_planes(stack_nv_f):
            """[nv, F] -> [F, 2, RT8, 128] with seam ghosts filled."""
            F = stack_nv_f.shape[-1]
            pls = _vertex_planes(pt, N, stack_nv_f)  # [2, npp, F]
            pls = jnp.moveaxis(pls, 2, 0).reshape(F, 2, 10 * R, R)
            out = jnp.zeros((F, 2, RT8, LANES), stack_nv_f.dtype)
            return out.at[:, :, 1:1 + 10 * R, :R].set(pls)

        # basis pair-packed plane layout (XLA, fused into the solve)
        W = min(R, 64)   # cell lanes (the b=N ghost column is zero)

        def pack_basis(bS):
            # [..., 6(g), npc] -> [..., 3, RT8, 128] pair-packed
            lead = bS.shape[:-2]
            b_ = bS[..., :npp].reshape(lead + (6, 10 * R, R))
            out = jnp.zeros(lead + (3, RT8, LANES), dt)
            out = out.at[..., 1:1 + 10 * R, 0:W].set(
                b_[..., 0:3, :, :W].astype(dt))
            out = out.at[..., 1:1 + 10 * R, 64:64 + W].set(
                b_[..., 3:6, :, :W].astype(dt))
            return out

        bgp = pack_basis(pt.basis_grad_S)      # [6,2,3,RT8,128]
        bip = pack_basis(pt.basis_int_S)
        bmp = pack_basis(pt.basis_metric_S)    # [6,3,RT8,128]

        # real cell layout -> padded slot columns -> planes
        zc = jnp.zeros((npc,), dt)
        press_npc = zc.at[pt.cell_pad_idx].set(pressure)
        ss_npc = zc.at[pt.cell_pad_idx].set(solve_stress.astype(dt))
        press_pl = cells_to_planes(press_npc[None, :])[0]
        ss_pl = cells_to_planes(ss_npc[None, :])[0]

        inv_stack = jnp.stack([
            uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0,
            ocean_u, ocean_v, solve_velocity.astype(dt), area_vertex,
            jnp.where(pt.denominator != 0, 1.0 / pt.denominator,
                      0.0).astype(dt),
            pt.tan_lat_vertex.astype(dt)], axis=-1)
        inv_pl = vert_to_planes(inv_stack)               # [12,2,RT8,128]

        uv_pl = vert_to_planes(jnp.stack([u, v], axis=-1))
        u_pl, v_pl = uv_pl[0], uv_pl[1]

        # stress: ring -> slot -> planes + exception side state
        from .variational_panel import (stress_ring_to_slot,
                                        stress_slot_to_ring)
        s_slot = [stress_ring_to_slot(pt, s) for s in (s11T, s22T, s12T)]
        t_pl = [cells_to_planes(s) for s in s_slot]
        texc0 = jnp.zeros((3, 8, 16), dt)
        for i, s in enumerate(s_slot):
            texc0 = texc0.at[i, :6, :n_exc].set(s[:, pt.exc_pad_cols])

        eye = jnp.eye(NP8, dtype=dt)
        jay = jnp.flip(jnp.eye(NP8, dtype=dt), axis=0)

        e_press = jnp.zeros((2, 16), dt)
        e_press = e_press.at[0, :n_exc].set(pressure[pt.exc_real])
        e_press = e_press.at[1, :n_exc].set(
            solve_stress[pt.exc_real].astype(dt))
        emask = jnp.zeros((me, 16), dt).at[:, :n_exc].set(pt.exc_mask)
        etle = jnp.zeros((me, 16), dt).at[:, :n_exc].set(
            pt.tan_lat_vertex[pt.exc_voc] * pt.exc_mask)
        ebg = jnp.zeros((me, 2, me, 16), dt).at[..., :n_exc].set(
            pt.exc_basis_grad.astype(dt))
        ebi = jnp.zeros((me, 2, me, 16), dt).at[..., :n_exc].set(
            pt.exc_basis_int.astype(dt))
        ebm = jnp.zeros((me, me, 16), dt).at[..., :n_exc].set(
            pt.exc_basis_metric.astype(dt))

        outs = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((2, RT8, LANES), dt),
                jax.ShapeDtypeStruct((2, RT8, LANES), dt),
                jax.ShapeDtypeStruct((6, RT8, 64), dt),
                jax.ShapeDtypeStruct((6, RT8, 64), dt),
                jax.ShapeDtypeStruct((6, RT8, 64), dt),
                jax.ShapeDtypeStruct((3, 8, 16), dt),
            ),
            in_specs=[vspec] * 20,
            out_specs=(vspec,) * 6,
            scratch_shapes=[
                pltpu.VMEM((6, RT8, LANES), dt),   # pu
                pltpu.VMEM((6, RT8, LANES), dt),   # pv
                pltpu.VMEM((6, RT8, LANES), dt),   # mu
                pltpu.VMEM((6, RT8, LANES), dt),   # mv
                pltpu.VMEM((4, RT8, LANES), dt),   # du/dv per t
            ],
            input_output_aliases={14: 0, 15: 1, 16: 2, 17: 3,
                                  18: 4, 19: 5},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(bgp, bip, bmp, press_pl, ss_pl, inv_pl, eye, jay,
          ebg, ebi, ebm, e_press, emask, etle,
          u_pl, v_pl,
          t_pl[0][:, :, :64], t_pl[1][:, :, :64], t_pl[2][:, :, :64],
          texc0)
        u_pl2, v_pl2, t11p, t22p, t12p, texc = outs

        u2 = planes_to_vert(u_pl2)
        v2 = planes_to_vert(v_pl2)
        sT_out = []
        for i, tp in enumerate((t11p, t22p, t12p)):
            full = jnp.concatenate(
                [tp, jnp.zeros((6, RT8, LANES - 64), dt)], axis=2)
            s_slot2 = planes_to_cells(full, 6)
            s_slot2 = s_slot2.at[:, pt.exc_pad_cols].set(
                texc[i, :6, :n_exc])
            sT_out.append(stress_slot_to_ring(pt, s_slot2))
        return u2, v2, sT_out[0], sT_out[1], sT_out[2]

    return run
