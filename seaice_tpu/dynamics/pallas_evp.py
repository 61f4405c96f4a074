"""Pallas fused EVP subcycle kernel (structured raster-quad meshes).

The XLA structured fast path (variational_fast.strain_tensor_S /
stress_divergence_S) already removes the per-index gathers, but every
subcycle still round-trips ~10 MB of corner/vertex arrays through HBM
and compiles to a chain of small kernels inside the `fori_loop`
(measured ~160 us/subcycle at 28k cells — ~10x the HBM speed of
light).  This module fuses the ENTIRE elastic subcycle loop
(reference `mpas_seaice_velocity_solver.F:2447-2592`: strain ->
constitutive -> stress divergence -> ocean drag -> 2x2 implicit
momentum solve) into ONE Pallas kernel in which u/v, the corner
stresses, and all per-vertex momentum fields stay VMEM-resident for
all ~120 subcycles; HBM is touched once on entry and once on exit.

TPU-native design choices:
  * raster layout [nx, ny]: the corner "gathers" are static 2-D
    slices (VPU lane/sublane shifts), the divergence "scatter" is four
    static slice-accumulates into a VMEM scratch plane;
  * on a regular quad grid the Wachspress basis tensors are identical
    for every cell (verified by `basis_is_cell_constant` at model
    build), so the [4,2,4,nCells] basis stream collapses to four 4x4
    scalar tables held in SMEM — the strain/divergence contractions
    become scalar-weighted plane sums with zero memory traffic;
  * the subcycle loop runs inside the kernel (`lax.fori_loop` mutating
    the output refs, which alias the inputs), so there is exactly one
    kernel launch — and one HBM round-trip — per velocity solve.

Numerics match the XLA structured path to floating-point roundoff (the
only divergence is using cell-0's basis values for all cells, equal to
within ~3e-14 relative on a uniform grid); `tests/test_pallas_evp.py`
asserts trajectory equality against the XLA oracle.

Eligibility (enforced by evp.make_velocity_solver): planar raster quad
mesh (mesh/structured.py), standard EVP constitutive relation,
quadratic ocean stress, no metric terms, cell-constant basis, single
device (the sharded path keeps XLA + per-subcycle ppermute halos).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as c


def basis_is_cell_constant(fast, rtol: float = 1e-8) -> bool:
    """True if the (concrete) FastTensors basis is identical for every
    cell — the regular-grid property the fused kernel exploits."""
    for a in (fast.basis_grad_T, fast.basis_int_T):
        a = np.asarray(a)
        scale = max(float(np.abs(a).max()), 1e-300)
        if float(np.abs(a - a[..., :1]).max()) > rtol * scale:
            return False
    return True


def build_pallas_subcycle(raster, *, dt_elastic: float,
                          damping_timescale: float, n_subcycles: int,
                          interpret: Optional[bool] = None):
    """Build the fused subcycle function for a raster-quad layout.

    Returns fn(gx, gy, bu, bv, u, v, t11, t22, t12, pressure,
               solve_stress, uo_v, vo_v, mass_vertex, mass_f, air_u,
               air_v, tilt_u, tilt_v, ocean_u, ocean_v, solve_velocity,
               area_vertex, denominator) -> (u, v, t11, t22, t12)
    with gx/gy/bu/bv the [4,4] cell-constant basis tables
    (basis_grad_T[:,0,:,0] etc.), u/v/... [nVertices] and t**
    [maxEdges, nCells] in the transposed subcycle layout used by
    evp.py's fast path.  Returns None if the layout is ineligible.
    """
    if raster is None or getattr(raster, "periodic", False):
        return None
    nxc, nyc = raster.nxc, raster.nyc
    nxv, nyv = raster.nxv, raster.nyv
    offsets = raster.offsets
    me = len(offsets)
    if me != 4:
        return None

    dte = float(dt_elastic)
    denom_c = 1.0 + (0.5 * dte) / float(damping_timescale)
    p_scale = dte / (2.0 * float(damping_timescale))
    ecc2 = float(c.EVP_ECCENTRICITY_SQ)
    puny = float(c.PUNY)
    cosw = float(c.COS_OCEAN_TURNING_ANGLE)
    sinw = float(c.SIN_OCEAN_TURNING_ANGLE)
    drag = float(c.ICE_OCEAN_DRAG * c.DENSITY_SEAWATER)

    def kernel(gx_ref, gy_ref, bu_ref, bv_ref,
               u_ref, v_ref, t11_ref, t22_ref, t12_ref,
               press_ref, ss_ref, uo_ref, vo_ref, mv_ref, mf_ref,
               au_ref, av_ref, tu_ref, tv_ref, ou_ref, ov_ref,
               sv_ref, areav_ref, den_ref,
               u_out, v_out, o11_ref, o22_ref, o12_ref,
               du_scr, dv_scr):
        # outputs alias the inputs: loop state lives in the out refs
        press = press_ref[:]
        ss_pos = ss_ref[:] > 0.0
        sv_pos = sv_ref[:] > 0.0
        uo = uo_ref[:]
        vo = vo_ref[:]
        mv = mv_ref[:]
        mf = mf_ref[:]
        rhs_u0 = au_ref[:] + tu_ref[:]      # constant across subcycles
        rhs_v0 = av_ref[:] + tv_ref[:]
        ocean_u = ou_ref[:]
        ocean_v = ov_ref[:]
        areav = areav_ref[:]
        den = den_ref[:]
        sgn_f = jnp.sign(mf)
        sgn_f = jnp.where(sgn_f == 0.0, 1.0, sgn_f)
        inv_den = jnp.where(den != 0.0, 1.0 / den, 0.0)

        def body(_, carry):
            u2 = u_out[:]
            v2 = v_out[:]
            # corner velocities: static raster slices (slot b)
            uc = [u2[oi:oi + nxc, oj:oj + nyc] for (oi, oj) in offsets]
            vc = [v2[oi:oi + nxc, oj:oj + nyc] for (oi, oj) in offsets]

            # per-corner: strain -> EVP stress relaxation
            for g in range(me):
                e11 = (gx_ref[0, g] * uc[0] + gx_ref[1, g] * uc[1] +
                       gx_ref[2, g] * uc[2] + gx_ref[3, g] * uc[3])
                e22 = (gy_ref[0, g] * vc[0] + gy_ref[1, g] * vc[1] +
                       gy_ref[2, g] * vc[2] + gy_ref[3, g] * vc[3])
                e12 = 0.5 * (
                    (gy_ref[0, g] * uc[0] + gy_ref[1, g] * uc[1] +
                     gy_ref[2, g] * uc[2] + gy_ref[3, g] * uc[3]) +
                    (gx_ref[0, g] * vc[0] + gx_ref[1, g] * vc[1] +
                     gx_ref[2, g] * vc[2] + gx_ref[3, g] * vc[3]))
                div = e11 + e22
                tension = e11 - e22
                shearing = 2.0 * e12
                delta = jnp.sqrt(div * div +
                                 (tension * tension +
                                  shearing * shearing) / ecc2)
                s11 = o11_ref[g]
                s22 = o22_ref[g]
                s12 = o12_ref[g]
                stress1 = s11 + s22
                stress2 = s11 - s22
                p_coeff = press / jnp.maximum(delta, puny) * p_scale
                stress1 = (stress1 + p_coeff * (div - delta)) / denom_c
                stress2 = (stress2 + (p_coeff / ecc2) * tension) / denom_c
                n12 = (s12 + (p_coeff / ecc2) * shearing * 0.5) / denom_c
                n11 = 0.5 * (stress1 + stress2)
                n22 = 0.5 * (stress1 - stress2)
                o11_ref[g] = jnp.where(ss_pos, n11, s11)
                o22_ref[g] = jnp.where(ss_pos, n22, s22)
                o12_ref[g] = jnp.where(ss_pos, n12, s12)

            # stress divergence: contraction + slice scatter-accumulate
            du_scr[:] = jnp.zeros((nxv, nyv), u2.dtype)
            dv_scr[:] = jnp.zeros((nxv, nyv), u2.dtype)
            for j, (oi, oj) in enumerate(offsets):
                pu = (bu_ref[0, j] * o11_ref[0] + bu_ref[1, j] * o11_ref[1] +
                      bu_ref[2, j] * o11_ref[2] + bu_ref[3, j] * o11_ref[3] +
                      bv_ref[0, j] * o12_ref[0] + bv_ref[1, j] * o12_ref[1] +
                      bv_ref[2, j] * o12_ref[2] + bv_ref[3, j] * o12_ref[3])
                pv = (bv_ref[0, j] * o22_ref[0] + bv_ref[1, j] * o22_ref[1] +
                      bv_ref[2, j] * o22_ref[2] + bv_ref[3, j] * o22_ref[3] +
                      bu_ref[0, j] * o12_ref[0] + bu_ref[1, j] * o12_ref[1] +
                      bu_ref[2, j] * o12_ref[2] + bu_ref[3, j] * o12_ref[3])
                du_scr[oi:oi + nxc, oj:oj + nyc] = \
                    du_scr[oi:oi + nxc, oj:oj + nyc] + pu
                dv_scr[oi:oi + nxc, oj:oj + nyc] = \
                    dv_scr[oi:oi + nxc, oj:oj + nyc] + pv
            div_u = jnp.where(sv_pos, -du_scr[:] * inv_den, 0.0)
            div_v = jnp.where(sv_pos, -dv_scr[:] * inv_den, 0.0)

            # ocean-stress coefficient (quadratic) + 2x2 momentum solve
            # (a21 = -a12, a22 = a11; reference velocity_solver.F:3096)
            oc = drag * areav * jnp.sqrt((uo - u2) ** 2 + (vo - v2) ** 2)
            oc = jnp.where(sv_pos, oc, 0.0)
            a11 = mv / dte + oc * cosw
            a12 = -mf - oc * sinw * sgn_f
            rhs1 = div_u + rhs_u0 + oc * ocean_u + mv * u2 / dte
            rhs2 = div_v + rhs_v0 + oc * ocean_v + mv * v2 / dte
            det = a11 * a11 + a12 * a12
            det = jnp.where(det == 0.0, 1.0, det)
            u_new = (a11 * rhs1 - a12 * rhs2) / det
            v_new = (a11 * rhs2 + a12 * rhs1) / det
            u_out[:] = jnp.where(sv_pos, u_new, u2)
            v_out[:] = jnp.where(sv_pos, v_new, v2)
            return 0

        jax.lax.fori_loop(0, n_subcycles, body, 0)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    @jax.jit
    def run(gx, gy, bu, bv, u, v, t11, t22, t12, pressure,
            solve_stress, uo_v, vo_v, mass_vertex, mass_f, air_u,
            air_v, tilt_u, tilt_v, ocean_u, ocean_v, solve_velocity,
            area_vertex, denominator):
        dt = u.dtype
        c3 = lambda a: a.reshape(me, nxc, nyc)
        c2 = lambda a: a.reshape(nxc, nyc)
        v2d = lambda a: a.reshape(nxv, nyv)
        outs = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nxv, nyv), dt),
                jax.ShapeDtypeStruct((nxv, nyv), dt),
                jax.ShapeDtypeStruct((me, nxc, nyc), dt),
                jax.ShapeDtypeStruct((me, nxc, nyc), dt),
                jax.ShapeDtypeStruct((me, nxc, nyc), dt),
            ),
            in_specs=[sspec] * 4 + [vspec] * 20,
            out_specs=(vspec,) * 5,
            scratch_shapes=[
                pltpu.VMEM((nxv, nyv), dt),
                pltpu.VMEM((nxv, nyv), dt),
            ],
            # u/v/t** loop state lives in the output refs
            input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4},
            interpret=interpret,
        )(gx, gy, bu, bv,
          v2d(u), v2d(v), c3(t11), c3(t22), c3(t12), c2(pressure),
          c2(solve_stress), v2d(uo_v), v2d(vo_v), v2d(mass_vertex),
          v2d(mass_f), v2d(air_u), v2d(air_v), v2d(tilt_u),
          v2d(tilt_v), v2d(ocean_u), v2d(ocean_v),
          v2d(solve_velocity), v2d(area_vertex), v2d(denominator))
        un, vn, t11n, t22n, t12n = outs
        return (un.reshape(-1), vn.reshape(-1),
                t11n.reshape(me, -1), t22n.reshape(me, -1),
                t12n.reshape(me, -1))

    return run
