"""Fused whole-loop EVP solver for ARBITRARY mesh connectivity.

One `pallas_call` runs the entire elastic subcycle loop (reference
`mpas_seaice_velocity_solver.F:2447-2592`: strain -> constitutive ->
stress divergence -> ocean drag -> 2x2 implicit momentum solve, x120)
for any MPAS-style unstructured mesh — SCVT/Voronoi (the QU-family of
production meshes), raw icosahedral, or file meshes — with all state
VMEM-resident.  Unlike `pallas_panel_fused.py` this kernel assumes NO
lattice structure: both mesh indirections are realized as exact lane
shuffles:

  * Cells are RCM-ordered and vertices first-touch-numbered
    (`gather_plan.py`), so gather windows stay narrow.
  * Per window row k the kernel broadcasts the row and applies
    `take_along_axis` over lanes with the plan's static lane indices,
    selecting rows by `ksel == k` — a gather whose numerics are
    bit-exact (shuffle, not arithmetic) at any dtype.  This replaces
    XLA's per-index gathers (~2.7 ns/idx, ~0.5M idx per subcycle at
    40k cells = the dominant cost of the unstructured velocity solve).
  * Gathers run on GROUPED tiles — 4 cell-chunks [32, 128] and
    8 vertex-rows [64, 128] per tile — because Mosaic's per-op
    overhead (~20 ns) otherwise dominates [8, 128]-sized shuffles;
    grouping amortizes it at the cost of a wider window union.
  * The stress-divergence "scatter" is re-expressed as the
    vertex-side gather of cell partials (exactly
    `variational_fast.stress_divergence_T`'s flat_corner_idx gather),
    with the metric tan(lat)/r factor folded into the cell-side
    partials — identical per-pair products, so numerics match the XLA
    path up to float reduction reassociation only.

Eligibility: standard EVP, quadratic ocean stress, variational
strains (no averaging), single device, f32-on-TPU (interpret mode at
any dtype).  Correctness is asserted against the XLA oracle in
interpret mode by `tests/test_unstructured_fused.py`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as c
from .gather_plan import UnstructuredPlan, LANES


def build_unstructured_solver(plan: UnstructuredPlan, *,
                              dt_elastic: float,
                              damping_timescale: float,
                              n_subcycles: int, include_metric: bool,
                              interpret: Optional[bool] = None,
                              _debug_skip: tuple = (),
                              _loop_form: bool = False):
    """Build fn(plan, u, v, s11T, s22T, s12T, pressure, solve_stress,
    uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0, ocean_u, ocean_v,
    solve_velocity, area_vertex) -> (u, v, s11T, s22T, s12T)

    with u/v/... [nVertices] and s**T [maxEdges, nCells] in MESH order
    (the wrapper applies the plan's orderings).  The plan flows through
    as traced data; its `meta` shapes are baked.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = plan.meta
    me, vd = m.me, m.vd
    NCHUNK, NGC, NGV, R_V = m.nchunk, m.ngc, m.ngv, m.r_v
    CG, VG = m.cg, m.vg
    n_sub = int(n_subcycles)

    dte = float(dt_elastic)
    denom_c = 1.0 + (0.5 * dte) / float(damping_timescale)
    p_scale = dte / (2.0 * float(damping_timescale))
    ecc2 = float(c.EVP_ECCENTRICITY_SQ)
    puny = float(c.PUNY)
    cosw = float(c.COS_OCEAN_TURNING_ANGLE)
    sinw = float(c.SIN_OCEAN_TURNING_ANGLE)
    drag = float(c.ICE_OCEAN_DRAG * c.DENSITY_SEAWATER)
    NPAIR = NCHUNK * 8
    SC = CG * 8                  # cell-group tile sublanes (32)
    SV = VG * 8                  # vertex-group tile sublanes (64)

    def kernel(wrow_s, kcount_s, vprow_s, vkcount_s,
               ksel_r, rlane_r, vksel_r, vrlane_r,
               gx_r, gy_r, bu_r, bv_r, bm_r, tlc_r, invden_r,
               press_r, ss_r, inv_r, u_in, v_in, s11_in, s22_in,
               s12_in,
               u_o, v_o, s11_o, s22_o, s12_o,
               pairs_s, du_s, dv_s):
        dt = u_in.dtype

        # seed running state (outputs are the working buffers; TPU
        # aliasing is reuse-only, so seed explicitly)
        u_o[:] = u_in[:]
        v_o[:] = v_in[:]
        s11_o[:] = s11_in[:]
        s22_o[:] = s22_in[:]
        s12_o[:] = s12_in[:]

        invden = invden_r[:]
        uo = inv_r[0]
        vo = inv_r[1]
        mv = inv_r[2]
        mf = inv_r[3]
        rhs_u0 = inv_r[4]
        rhs_v0 = inv_r[5]
        ocn_u = inv_r[6]
        ocn_v = inv_r[7]
        sv = inv_r[8]
        areav = inv_r[9]
        sv_pos = sv > 0.0
        sgn = jnp.sign(mf)
        sgn = jnp.where(sgn == 0, 1.0, sgn).astype(dt)

        def gather_group(row_fns, n_k, sel, lanes, nsub):
            """For F fields: tile_f[t, l] = src_f[row(ksel), rlane]
            via broadcast + take_along_axis per window row (select
            masks shared across fields)."""
            F = len(row_fns)

            def body(k, carry):
                mask = sel == k
                out = []
                for f in range(F):
                    row = row_fns[f](k)                  # [1, 128]
                    # the broadcast must be explicit: Mosaic's gather
                    # lowering only accepts same-shape 2D operand and
                    # index tiles (an implicit [1,128] -> [nsub,128]
                    # broadcast folds into the gather and fails to
                    # lower on real TPU)
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(row, (nsub, LANES)), lanes,
                        axis=1)
                    out.append(jnp.where(mask, g, carry[f]))
                return tuple(out)
            init = tuple(jnp.zeros((nsub, LANES), dt)
                         for _ in range(F))
            return jax.lax.fori_loop(0, n_k, body, init)

        def cell_group(grp, _):
            if "cell_gather" in _debug_skip:
                ucG = jnp.broadcast_to(u_o[0:1], (SC, LANES)) * 0.01
                vcG = jnp.broadcast_to(v_o[0:1], (SC, LANES)) * 0.01
            else:
                ucG, vcG = gather_group(
                    (lambda k: u_o[pl.ds(wrow_s[grp, k], 1)],
                     lambda k: v_o[pl.ds(wrow_s[grp, k], 1)]),
                    kcount_s[grp], ksel_r[grp], rlane_r[grp], SC)

            gxg = gx_r[grp]                       # [me, SC, 128]
            gyg = gy_r[grp]
            bug = bu_r[grp]
            bvg = bv_r[grp]
            if include_metric:
                bmg = bm_r[grp]
                tlg = tlc_r[grp]                  # [SC, 128]
            pressg = press_r[grp]                 # [SC, 128] pre-tiled
            ssg = ss_r[grp] > 0.0

            # per-chunk math on [8,128] tiles (static unroll over the
            # CG chunks of the group)
            for mloc in range(CG):
                chunk = grp * CG + mloc
                lo = mloc * 8
                ucT = ucG[lo:lo + 8]
                vcT = vcG[lo:lo + 8]

                # strain at each corner g (sublane) — reference
                # velocity_solver_variational.F:575-670
                e11 = jnp.zeros((8, LANES), dt)
                e22 = jnp.zeros((8, LANES), dt)
                exy = jnp.zeros((8, LANES), dt)
                for b in range(me):
                    ub = ucT[b:b + 1]
                    vb = vcT[b:b + 1]
                    e11 = e11 + ub * gxg[b, lo:lo + 8]
                    e22 = e22 + vb * gyg[b, lo:lo + 8]
                    exy = exy + ub * gyg[b, lo:lo + 8] + \
                        vb * gxg[b, lo:lo + 8]
                e12 = 0.5 * exy
                if include_metric:
                    tlcc = tlg[lo:lo + 8]
                    e11 = e11 - vcT * tlcc
                    e12 = e12 + 0.5 * ucT * tlcc

                # EVP stress relaxation
                # (constitutive_relation.F:178-373)
                s11 = s11_o[chunk]
                s22 = s22_o[chunk]
                s12 = s12_o[chunk]
                div = e11 + e22
                tension = e11 - e22
                shearing = 2.0 * e12
                delta = jnp.sqrt(
                    div * div + (tension * tension +
                                 shearing * shearing) / ecc2)
                press = pressg[lo:lo + 8]
                ssm = ssg[lo:lo + 8]
                stress1 = s11 + s22
                stress2 = s11 - s22
                pc = press / jnp.maximum(delta, puny) * p_scale
                stress1 = (stress1 + pc * (div - delta)) / denom_c
                stress2 = (stress2 + (pc / ecc2) * tension) / denom_c
                m12 = (s12 + (pc / ecc2) * shearing * 0.5) / denom_c
                m11 = 0.5 * (stress1 + stress2)
                m22 = 0.5 * (stress1 - stress2)
                s11 = jnp.where(ssm, m11, s11)
                s22 = jnp.where(ssm, m22, s22)
                s12 = jnp.where(ssm, m12, s12)
                s11_o[chunk] = s11
                s22_o[chunk] = s22
                s12_o[chunk] = s12

                # divergence partials per dual slot j (sublane), metric
                # vertex factor folded in (identical per-pair products
                # to stress_divergence_T's post-gather tan(lat)
                # multiply)
                pu = jnp.zeros((8, LANES), dt)
                pv = jnp.zeros((8, LANES), dt)
                for s in range(me):
                    s11s = s11[s:s + 1]
                    s22s = s22[s:s + 1]
                    s12s = s12[s:s + 1]
                    pu = pu + s11s * bug[s, lo:lo + 8] + \
                        s12s * bvg[s, lo:lo + 8]
                    pv = pv + s22s * bvg[s, lo:lo + 8] + \
                        s12s * bug[s, lo:lo + 8]
                if include_metric:
                    mu = jnp.zeros((8, LANES), dt)
                    mvp = jnp.zeros((8, LANES), dt)
                    for s in range(me):
                        mu = mu + s12[s:s + 1] * bmg[s, lo:lo + 8]
                        mvp = mvp + s11[s:s + 1] * bmg[s, lo:lo + 8]
                    pu = pu + mu * tlcc
                    pv = pv - mvp * tlcc
                pairs_s[0, pl.ds(chunk * 8, 8)] = pu
                pairs_s[1, pl.ds(chunk * 8, 8)] = pv
            return 0

        def vertex_group(grp, _):
            if "vertex_gather" in _debug_skip:
                gu = jnp.broadcast_to(pairs_s[0, 0:1], (SV, LANES))
                gv = jnp.broadcast_to(pairs_s[1, 0:1], (SV, LANES))
            else:
                gu, gv = gather_group(
                    (lambda k: pairs_s[0, pl.ds(vprow_s[grp, k], 1)],
                     lambda k: pairs_s[1, pl.ds(vprow_s[grp, k], 1)]),
                    vkcount_s[grp], vksel_r[grp], vrlane_r[grp], SV)
            # sum the vd dual slots: sublane = 8*row_local + d
            gu3 = gu.reshape(VG, 8, LANES)
            gv3 = gv.reshape(VG, 8, LANES)
            du = -gu3[:, 0, :]
            dv = -gv3[:, 0, :]
            for d in range(1, vd):
                du = du - gu3[:, d, :]
                dv = dv - gv3[:, d, :]
            du_s[pl.ds(grp * VG, VG)] = du
            dv_s[pl.ds(grp * VG, VG)] = dv
            return 0

        def body(_, carry):
            jax.lax.fori_loop(0, NGC, cell_group, 0)
            jax.lax.fori_loop(0, NGV, vertex_group, 0)

            # momentum solve (velocity_solver.F:3096-3208), whole-plane
            u = u_o[:]
            v = v_o[:]
            div_u = jnp.where(sv_pos, du_s[:] * invden, 0.0)
            div_v = jnp.where(sv_pos, dv_s[:] * invden, 0.0)
            oc = drag * areav * jnp.sqrt((uo - u) ** 2 + (vo - v) ** 2)
            oc = jnp.where(sv_pos, oc, 0.0)
            a11 = mv / dte + oc * cosw
            a12 = -mf - oc * sinw * sgn
            rhs1 = div_u + rhs_u0 + oc * ocn_u + mv * u / dte
            rhs2 = div_v + rhs_v0 + oc * ocn_v + mv * v / dte
            det = a11 * a11 + a12 * a12
            det = jnp.where(det == 0.0, 1.0, det)
            un = (a11 * rhs1 - a12 * rhs2) / det
            vn = (a11 * rhs2 + a12 * rhs1) / det
            u_o[:] = jnp.where(sv_pos, un, u)
            v_o[:] = jnp.where(sv_pos, vn, v)
            return carry

        jax.lax.fori_loop(0, n_sub, body, 0)

    # ---- XLA wrapper: ordering + layout conversion ----

    nc, nv = m.nc, m.nv
    nvp = R_V * LANES
    ncp = NCHUNK * LANES

    def vplane(plan, x, dt):
        xz = jnp.zeros((nvp,), dt).at[:nv].set(
            x.astype(dt)[plan.vertex_perm])
        return xz.reshape(R_V, LANES)

    def cplane_tiled(plan, x, dt):
        """[nc] cell field -> [NGC, 32, 128] (each chunk's row
        repeated over its 8 sublanes, grouped by CG)."""
        xz = jnp.zeros((ncp,), dt).at[:nc].set(
            x.astype(dt)[plan.cell_perm])
        xc = xz.reshape(NCHUNK, 1, LANES)
        xc = jnp.broadcast_to(xc, (NCHUNK, 8, LANES))
        return xc.reshape(NGC, CG * 8, LANES)

    def stiles(plan, sT, dt):
        # [me, nc] ring corner stress -> [NCHUNK, 8, 128]
        sp = jnp.zeros((8, ncp), dt).at[:me, :nc].set(
            sT.astype(dt)[:, plan.cell_perm])
        return jnp.moveaxis(sp.reshape(8, NCHUNK, LANES), 0, 1)

    def sring(plan, tp):
        sp = jnp.moveaxis(tp, 1, 0).reshape(8, ncp)[:me, :nc]
        return sp[:, plan.cell_inv]

    def call_kernel(plan, press_t, ss_t, inv, u_pl, v_pl, t11, t22,
                    t12):
        dt = u_pl.dtype
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R_V, LANES), dt),
                jax.ShapeDtypeStruct((R_V, LANES), dt),
                jax.ShapeDtypeStruct((NCHUNK, 8, LANES), dt),
                jax.ShapeDtypeStruct((NCHUNK, 8, LANES), dt),
                jax.ShapeDtypeStruct((NCHUNK, 8, LANES), dt),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 19,
                out_specs=(vspec,) * 5,
                scratch_shapes=[
                    pltpu.VMEM((2, NPAIR, LANES), dt),
                    pltpu.VMEM((R_V, LANES), dt),
                    pltpu.VMEM((R_V, LANES), dt),
                ],
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(plan.wrow, plan.kcount, plan.vprow, plan.vkcount,
          plan.ksel, plan.rlane, plan.vksel, plan.vrlane,
          plan.gx, plan.gy, plan.bu, plan.bv, plan.bm, plan.tlc,
          plan.inv_den, press_t, ss_t, inv, u_pl, v_pl, t11, t22, t12)

    def prepare(plan, u, v, s11T, s22T, s12T, pressure, solve_stress,
                uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0,
                ocean_u, ocean_v, solve_velocity, area_vertex):
        dt = u.dtype
        inv = jnp.stack([
            vplane(plan, uo_v, dt), vplane(plan, vo_v, dt),
            vplane(plan, mass_vertex, dt), vplane(plan, mass_f, dt),
            vplane(plan, rhs_u0, dt), vplane(plan, rhs_v0, dt),
            vplane(plan, ocean_u, dt), vplane(plan, ocean_v, dt),
            vplane(plan, solve_velocity, dt),
            vplane(plan, area_vertex, dt)], axis=0)
        ctx = (cplane_tiled(plan, pressure, dt),
               cplane_tiled(plan, solve_stress, dt), inv)
        carry = (vplane(plan, u, dt), vplane(plan, v, dt),
                 stiles(plan, s11T, dt), stiles(plan, s22T, dt),
                 stiles(plan, s12T, dt))
        return carry, ctx

    def step1(plan, carry, ctx):
        press_t, ss_t, inv = ctx
        return call_kernel(plan, press_t, ss_t, inv, *carry)

    def finish(plan, carry):
        u2p, v2p, t11, t22, t12 = carry
        u2 = u2p.reshape(-1)[:nv][plan.vertex_inv]
        v2 = v2p.reshape(-1)[:nv][plan.vertex_inv]
        return (u2, v2, sring(plan, t11), sring(plan, t22),
                sring(plan, t12))

    if _loop_form:
        return prepare, step1, finish

    def run(plan, u, v, s11T, s22T, s12T, pressure, solve_stress,
            uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0,
            ocean_u, ocean_v, solve_velocity, area_vertex):
        carry, ctx = prepare(
            plan, u, v, s11T, s22T, s12T, pressure, solve_stress,
            uo_v, vo_v, mass_vertex, mass_f, rhs_u0, rhs_v0,
            ocean_u, ocean_v, solve_velocity, area_vertex)
        carry = step1(plan, carry, ctx)
        return finish(plan, carry)

    return run


def build_unstructured_loop_solver(plan: UnstructuredPlan, *,
                                   dt_elastic: float,
                                   damping_timescale: float,
                                   include_metric: bool,
                                   interpret: Optional[bool] = None):
    """Per-subcycle variant for the SHARDED path.

    The reference exchanges the vertex velocity halo after EVERY
    elastic subcycle (`mpas_seaice_velocity_solver.F:2546-2584`).
    This exposes the fused kernel one subcycle at a time so the
    caller interleaves the collective, with the state kept in the
    plan's [rows, 128] layout across the whole loop (the layout /
    ordering conversions happen once, not per subcycle):

        prepare(plan, ...) -> (carry, ctx)
        step1(plan, carry, ctx) -> carry   # one pallas_call
        finish(plan, carry) -> (u, v, s11T, s22T, s12T)

    carry = (u_pl, v_pl, t11, t22, t12) in plan layout; the caller
    refreshes the u_pl/v_pl halos between step1 calls (in plan
    coordinates — see parallel/sharded.py)."""
    solver1 = build_unstructured_solver(
        plan, dt_elastic=dt_elastic,
        damping_timescale=damping_timescale, n_subcycles=1,
        include_metric=include_metric, interpret=interpret,
        _loop_form=True)
    return solver1


# NOTE: build_unstructured_solver grows a private `_loop_form` switch
# rather than duplicating the kernel: when set, it returns
# (prepare, step1, finish) operating on plan-layout carries.
