"""Variational FEM basis precompute (Wachspress and PWL).

Host-side (NumPy) computation done once at init, mirroring the behavior of
the reference's basis modules
(`/root/reference/src/shared/mpas_seaice_velocity_solver_wachspress.F`,
`mpas_seaice_velocity_solver_pwl.F`, and the variational denominator in
`mpas_seaice_velocity_solver_variational.F:358-445`), but fully vectorized
over cells grouped by polygon size.

Products:
  basis_gradient_u/v [nCells, maxEdges(b), maxEdges(g)]
      d(basis_b)/dx,dy evaluated at cell corner g (zero unless g is b or a
      cyclic neighbor of b — exact Wachspress sparsity).
  basis_integrals_u/v [nCells, maxEdges(s), maxEdges(g)]
      integral over the cell of basis_s * d(basis_g)/dx,dy.
  basis_integrals_metric [nCells, maxEdges(s), maxEdges(g)]
      integral of basis_s * basis_g.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..mesh.core import Mesh
from . import quadrature


@dataclasses.dataclass
class VariationalBasis:
    basis_gradient_u: np.ndarray       # [nCells, maxEdges, maxEdges]
    basis_gradient_v: np.ndarray
    basis_integrals_u: np.ndarray      # [nCells, maxEdges, maxEdges]
    basis_integrals_v: np.ndarray
    basis_integrals_metric: np.ndarray
    variational_denominator: np.ndarray  # [nVertices]
    tan_lat_vertex_over_radius: np.ndarray  # [nVertices]


# -- Wachspress rational basis ------------------------------------------------

def _wachspress_coefficients(xl: np.ndarray, yl: np.ndarray):
    """Edge-line coefficients and kappa factors for polygons [nc, n].

    Edge i joins vertex i-1 -> i (cyclic); its line is 1 - A x - B y = 0.
    """
    xp = np.roll(xl, 1, axis=1)
    yp = np.roll(yl, 1, axis=1)
    det = xp * yl - xl * yp
    A = (yl - yp) / det
    B = (xp - xl) / det

    nc, n = xl.shape
    kappa = np.empty((nc, n))
    kappa[:, 0] = 1.0
    for j in range(1, n):
        i0, i1, i2 = j - 1, j, (j + 1) % n
        num = A[:, i2] * (xl[:, i0] - xl[:, i1]) + \
            B[:, i2] * (yl[:, i0] - yl[:, i1])
        den = A[:, i0] * (xl[:, i1] - xl[:, i0]) + \
            B[:, i0] * (yl[:, i1] - yl[:, i0])
        kappa[:, j] = kappa[:, j - 1] * num / den
    return A, B, kappa


def _wachspress_eval(A, B, kappa, px, py, want_derivatives=True):
    """Evaluate all n Wachspress basis functions (and derivatives) at points.

    A,B,kappa: [nc, n]; px,py: [nc, P].
    Returns (phi [nc, n, P], dphix, dphiy) (derivatives None if not wanted).
    """
    nc, n = A.shape
    P = px.shape[1]
    # edge equations at all points
    e = 1.0 - A[:, :, None] * px[:, None, :] - B[:, :, None] * py[:, None, :]

    num = np.empty((nc, n, P))
    dnumx = np.empty((nc, n, P)) if want_derivatives else None
    dnumy = np.empty((nc, n, P)) if want_derivatives else None

    for j in range(n):
        subset = [k for k in range(n) if k != j and k != (j + 1) % n]
        m = len(subset)
        # prefix[i] = prod of e over subset[:i]; suffix[i] = prod subset[i+1:]
        prefix = np.ones((m + 1, nc, P))
        for i, k in enumerate(subset):
            prefix[i + 1] = prefix[i] * e[:, k, :]
        suffix = np.ones((m + 1, nc, P))
        for i in range(m - 1, -1, -1):
            suffix[i] = suffix[i + 1] * e[:, subset[i], :]
        num[:, j, :] = kappa[:, j, None] * prefix[m]
        if want_derivatives:
            sx = np.zeros((nc, P))
            sy = np.zeros((nc, P))
            for i, k in enumerate(subset):
                rest = prefix[i] * suffix[i + 1]
                sx += -A[:, k, None] * rest
                sy += -B[:, k, None] * rest
            dnumx[:, j, :] = kappa[:, j, None] * sx
            dnumy[:, j, :] = kappa[:, j, None] * sy

    D = num.sum(axis=1, keepdims=True)
    phi = num / D
    if not want_derivatives:
        return phi, None, None
    Dx = dnumx.sum(axis=1, keepdims=True)
    Dy = dnumy.sum(axis=1, keepdims=True)
    dphix = dnumx / D - num * Dx / D ** 2
    dphiy = dnumy / D - num * Dy / D ** 2
    return phi, dphix, dphiy


def _wachspress_group(xl, yl, integration_type, integration_order,
                      chunk=8192):
    """Compute gradient + integral tensors for a group of n-gon cells.

    xl, yl: [nc, n] local CCW vertex coordinates.
    Returns (gu, gv, su, sv, sm) each [nc, n, n].
    """
    nc, n = xl.shape
    qu, qv, qw, norm = quadrature.get_rule(integration_type,
                                           integration_order)
    gu = np.empty((nc, n, n))
    gv = np.empty((nc, n, n))
    su = np.empty((nc, n, n))
    sv = np.empty((nc, n, n))
    sm = np.empty((nc, n, n))

    # exact Wachspress sparsity of corner gradients: nonzero only when the
    # evaluation corner g is b-1, b, or b+1 (cyclic)
    b_idx = np.arange(n)[:, None]
    g_idx = np.arange(n)[None, :]
    diff = (b_idx - g_idx) % n
    sparse_mask = (diff == 0) | (diff == 1) | (diff == n - 1)

    for s0 in range(0, nc, chunk):
        s1 = min(s0 + chunk, nc)
        x = xl[s0:s1]
        y = yl[s0:s1]
        m = s1 - s0
        A, B, kappa = _wachspress_coefficients(x, y)

        # gradients at the n cell corners
        _, dbx, dby = _wachspress_eval(A, B, kappa, x, y)
        # dbx[c, b, g]: derivative of basis b at corner g
        gu[s0:s1] = np.where(sparse_mask[None], dbx, 0.0)
        gv[s0:s1] = np.where(sparse_mask[None], dby, 0.0)

        # integrals over the polygon: subdivide into n triangles
        # (0, v_s, v_{s+1}), map the reference triangle, evaluate at
        # quadrature points
        P = len(qu)
        px = np.empty((m, n, P))
        py = np.empty((m, n, P))
        jac = np.empty((m, n))
        for s in range(n):
            s2 = (s + 1) % n
            # affine map: (u,v) -> u*v_s + v*v_{s+1}
            px[:, s, :] = x[:, s, None] * qu[None, :] + \
                x[:, s2, None] * qv[None, :]
            py[:, s, :] = y[:, s, None] * qu[None, :] + \
                y[:, s2, None] * qv[None, :]
            jac[:, s] = x[:, s] * y[:, s2] - x[:, s2] * y[:, s]

        phi, dphix, dphiy = _wachspress_eval(
            A, B, kappa, px.reshape(m, -1), py.reshape(m, -1))
        phi = phi.reshape(m, n, n, P)      # [cell, basis, subtri, qp]
        dphix = dphix.reshape(m, n, n, P)
        dphiy = dphiy.reshape(m, n, n, P)

        jw = jac[:, None, :, None] * qw[None, None, None, :] / norm
        # S*[c, s(stress basis), g(velocity basis)]
        su[s0:s1] = np.einsum("cstq,cgtq->csg", phi * jw, dphix)
        sv[s0:s1] = np.einsum("cstq,cgtq->csg", phi * jw, dphiy)
        sm[s0:s1] = np.einsum("cstq,cgtq->csg", phi * jw, phi)

    return gu, gv, su, sv, sm


# -- PWL basis ----------------------------------------------------------------

def _pwl_group(xl, yl, area_cell):
    """PWL basis tensors for a group of n-gon cells.

    Mirrors seaice_init_velocity_solver_pwl (reference pwl.F:44-373):
    subdivide the polygon into n triangles around the vertex-mean center;
    the PWL basis for vertex b is the linear basis on each subtriangle
    whose center value is alpha = 1/n.
    Returns (gu, gv, su, sv, sm) each [nc, n, n].
    """
    nc, n = xl.shape
    alpha = 1.0 / n
    xc = xl.mean(axis=1, keepdims=True)
    yc = yl.mean(axis=1, keepdims=True)
    x = xl - xc
    y = yl - yc

    x2 = np.roll(x, -1, axis=1)
    y2 = np.roll(y, -1, axis=1)

    # subtriangle s: vertices (v_s, v_{s+1}, center=origin)
    # linear basis coefficients by solving the 3x3 system analytically:
    #   phi(p) = gu*px + gv*py + c  with  phi(center)=c
    det = x * y2 - x2 * y
    # basis 1 (value 1 at v_s): grad = (y2, -x2)/det, const 0
    g1u = y2 / det
    g1v = -x2 / det
    # basis 2 (value 1 at v_{s+1}): grad = (-y, x)/det
    g2u = -y / det
    g2v = x / det
    # basis 3 (center): grad = -(g1+g2), const 1
    g3u = -g1u - g2u
    g3v = -g1v - g2v

    # subtriangle areas, scaled so they sum to the true cell area
    sub_area = 0.5 * np.abs(det)
    sub_area *= (area_cell[:, None] / sub_area.sum(axis=1, keepdims=True))

    # gradient of PWL basis b on subtriangle s:
    #   alpha*g3 + g1*(s==b) + g2*(s==b-1)
    b_idx = np.arange(n)[:, None]
    s_idx = np.arange(n)[None, :]
    is1 = (s_idx == b_idx).astype(float)              # s == b
    is2 = (s_idx == (b_idx - 1) % n).astype(float)    # s == b-1
    # [nc, b, s]
    cgu = alpha * g3u[:, None, :] + g1u[:, None, :] * is1 + \
        g2u[:, None, :] * is2
    cgv = alpha * g3v[:, None, :] + g1v[:, None, :] * is1 + \
        g2v[:, None, :] * is2

    # corner gradients: average of the two subtriangles sharing corner g
    # (s = g and s = g-1; reference pwl.F:260-274)
    prev = (np.arange(n) - 1) % n
    gu = 0.5 * (cgu + cgu[:, :, prev])
    gv = 0.5 * (cgv + cgv[:, :, prev])

    # integral of basis_s over subtriangle t: ((alpha + [t in {s, s-1}]) *
    # area_t) / 3  (reference pwl.F:283-289)
    t_in = ((s_idx == b_idx) | (s_idx == (b_idx - 1) % n)).astype(float)
    basis_int = (alpha + t_in) * sub_area[:, None, :] / 3.0  # [nc, s, t]
    # S_U[c, s, g] = sum_t gradient_g(t) * integral of basis_s over t
    su = np.einsum("cst,cgt->csg", basis_int, cgu)
    sv = np.einsum("cst,cgt->csg", basis_int, cgv)

    # metric integrals of basis_s*basis_g per subtriangle via the exact
    # quadratic-product table (reference pwl.F:303-362)
    # type 1: t == b; type 2: t == b-1; type 3: otherwise
    # type_of[b, t]: 1 if t==b, 2 if t==b-1, 3 otherwise
    type_of = np.where(s_idx == b_idx, 1,
                       np.where(s_idx == (b_idx - 1) % n, 2, 3))
    val = {(1, 1): 2 * alpha ** 2 + 2 * alpha + 2,
           (2, 2): 2 * alpha ** 2 + 2 * alpha + 2,
           (1, 2): 2 * alpha ** 2 + 2 * alpha + 1,
           (2, 1): 2 * alpha ** 2 + 2 * alpha + 1,
           (1, 3): 2 * alpha ** 2 + alpha,
           (3, 1): 2 * alpha ** 2 + alpha,
           (2, 3): 2 * alpha ** 2 + alpha,
           (3, 2): 2 * alpha ** 2 + alpha,
           (3, 3): 2 * alpha ** 2}
    # coeff[s, g, t]
    coeff = np.zeros((n, n, n))
    for s in range(n):
        for g in range(n):
            for t in range(n):
                coeff[s, g, t] = val[(type_of[s, t], type_of[g, t])]
    sm = np.einsum("sgt,ct->csg", coeff, sub_area) / 12.0

    return gu, gv, su, sv, sm


# -- public entry -------------------------------------------------------------

def compute_variational_basis(
        mesh: Mesh,
        basis_type: str = "wachspress",
        integration_type: str = "dunavant",
        integration_order: int = 8,
        denominator_type: str = "original",
        include_metric_terms: bool = False,
        rotate_cartesian_grid: bool = True) -> VariationalBasis:
    """Full variational init (reference variational.F:108-344)."""
    nc, me = mesh.n_cells, mesh.max_edges
    gu = np.zeros((nc, me, me))
    gv = np.zeros((nc, me, me))
    su = np.zeros((nc, me, me))
    sv = np.zeros((nc, me, me))
    sm = np.zeros((nc, me, me))

    # spherical: project vertices onto the cell tangent plane in the
    # (optionally rotated) frame — the reference's spherical local
    # coordinates (variational_shared.F:191-279, rotation per
    # seaice_grid_rotation_forward)
    if mesh.on_sphere:
        from ..mesh.core import project_3d_onto_local_2d
        from ..mesh.rotation import grid_rotation_forward
        voc = mesh.vertices_on_cell
        valid = voc >= 0
        voc_safe = np.where(valid, voc, 0)
        xc, yc, zc = mesh.x_cell, mesh.y_cell, mesh.z_cell
        xv = mesh.x_vertex[voc_safe]
        yv = mesh.y_vertex[voc_safe]
        zv = mesh.z_vertex[voc_safe]
        if rotate_cartesian_grid:
            xc, yc, zc = grid_rotation_forward(xc, yc, zc)
            xv, yv, zv = grid_rotation_forward(xv, yv, zv)
        center = np.stack([xc, yc, zc], axis=-1)
        points = np.stack([xv, yv, zv], axis=-1)
        xl_all, yl_all = project_3d_onto_local_2d(points, center)
        x_local = np.where(valid, xl_all, 0.0)
        y_local = np.where(valid, yl_all, 0.0)
    else:
        x_local = mesh.x_local
        y_local = mesh.y_local

    for n in np.unique(mesh.n_edges_on_cell):
        if n < 3:
            # degenerate (e.g. padded dummy cells in partitioned local
            # blocks): zero basis
            continue
        sel = np.nonzero(mesh.n_edges_on_cell == n)[0]
        xl = x_local[sel, :n]
        yl = y_local[sel, :n]
        if basis_type == "wachspress":
            g = _wachspress_group(xl, yl, integration_type,
                                  integration_order)
        elif basis_type == "pwl":
            g = _pwl_group(xl, yl, mesh.area_cell[sel])
        else:
            raise ValueError(f"unknown basis type {basis_type!r}")
        for dst, src in zip((gu, gv, su, sv, sm), g):
            dst[sel[:, None, None], np.arange(n)[:, None],
                np.arange(n)[None, :]] = src

    # metric terms tan(lat)/r at vertices (zero on planar meshes;
    # reference variational_shared.F:293-358)
    if include_metric_terms and mesh.on_sphere:
        xv, yv, zv = mesh.x_vertex, mesh.y_vertex, mesh.z_vertex
        if rotate_cartesian_grid:
            # pole rotated onto the equator (reference
            # seaice_grid_rotation_forward: (x,y,z) -> (-z, y, x))
            xr, yr, zr = -zv, yv, xv
        else:
            xr, yr, zr = xv, yv, zv
        lat = np.arcsin(np.clip(zr / mesh.sphere_radius, -1.0, 1.0))
        tan_lat = np.tan(lat) / mesh.sphere_radius
    else:
        tan_lat = np.zeros(mesh.n_vertices)

    # variational denominator (reference variational.F:358-445)
    if denominator_type == "original":
        denom = mesh.area_triangle.copy()
    elif denominator_type == "alternate":
        denom = np.zeros(mesh.n_vertices)
        cov = mesh.cells_on_vertex
        cva = mesh.cell_vertices_at_vertex
        for k in range(mesh.vertex_degree):
            c = cov[:, k]
            j = cva[:, k]
            valid = c >= 0
            cs = np.where(valid, c, 0)
            js = np.where(valid, j, 0)
            contrib = sm[cs, :, js].sum(axis=1)
            denom += np.where(valid, contrib, 0.0)
    else:
        raise ValueError(f"unknown denominator type {denominator_type!r}")

    return VariationalBasis(
        basis_gradient_u=gu, basis_gradient_v=gv,
        basis_integrals_u=su, basis_integrals_v=sv,
        basis_integrals_metric=sm,
        variational_denominator=denom,
        tan_lat_vertex_over_radius=tan_lat,
    )
