"""Weak (line-integral) strain and stress-divergence operators.

TPU-native re-design of the reference weak scheme
(`mpas_seaice_velocity_solver_weak.F`: strain :112, stress divergence
:493) and its normal-vector init (`mpas_seaice_mesh.F`:
seaice_normal_vectors :703-1000): Green's-theorem strain on primal
cells, stress divergence on the dual triangles. Stresses are
cell-centered scalars (one per cell, unlike the variational scheme's
per-corner values).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..mesh.core import Mesh, MeshTensors
from ..utils.pytree import pytree_dataclass


def _wrap(d, period):
    if period > 0.0:
        return d - period * np.round(d / period)
    return d


@pytree_dataclass
class WeakTensors:
    """Static tensors for the weak scheme (device arrays)."""
    normal_polygon: Any        # [nCells, maxEdges, 2] outward normals
    dv_on_cell: Any            # [nCells, maxEdges] primal edge lengths
    voe_on_cell: Any           # [nCells, maxEdges, 2] vertex ids per edge
    edge_on_cell_mask: Any     # [nCells, maxEdges]
    normal_triangle: Any       # [nVertices, vertexDegree, 2]
    dc_on_vertex: Any          # [nVertices, vertexDegree]
    coe_on_vertex: Any         # [nVertices, vertexDegree, 2] cell ids
    edge_on_vertex_mask: Any   # [nVertices, vertexDegree]
    tan_lat_cell: Any          # [nCells] tan(lat)/r (0 planar)
    tan_lat_vertex: Any        # [nVertices]


def build_weak_tensors(mesh: Mesh, dtype=jnp.float64) -> WeakTensors:
    """Host-side normal-vector precompute (reference
    seaice_normal_vectors, mpas_seaice_mesh.F:703-1000; planar branch)."""
    if mesh.on_sphere:
        raise NotImplementedError(
            "weak scheme on spherical meshes lands with the spherical "
            "normal-vector precompute; use the variational scheme")
    nc, me = mesh.n_cells, mesh.max_edges
    nv, vd = mesh.n_vertices, mesh.vertex_degree
    px, py = mesh.period_x, mesh.period_y

    nvp = np.zeros((nc, me, 2))
    dv_on_cell = np.zeros((nc, me))
    voe_on_cell = np.zeros((nc, me, 2), np.int32)
    eoc_mask = np.zeros((nc, me))
    for c in range(nc):
        for k in range(mesh.n_edges_on_cell[c]):
            e = mesh.edges_on_cell[c, k]
            if e < 0:
                continue
            v1, v2 = mesh.vertices_on_edge[e]
            if v1 < 0 or v2 < 0:
                continue
            tx = _wrap(mesh.x_vertex[v2] - mesh.x_vertex[v1], px)
            ty = _wrap(mesh.y_vertex[v2] - mesh.y_vertex[v1], py)
            tmag = np.hypot(tx, ty)
            tx, ty = tx / tmag, ty / tmag
            nx = _wrap(mesh.x_edge[e] - mesh.x_cell[c], px)
            ny = _wrap(mesh.y_edge[e] - mesh.y_cell[c], py)
            if nx * ty - ny * tx < 0.0:
                tx, ty = -tx, -ty
            nvp[c, k] = (ty, -tx)
            dv_on_cell[c, k] = mesh.dv_edge[e]
            voe_on_cell[c, k] = (v1, v2)
            eoc_mask[c, k] = 1.0

    nvt = np.zeros((nv, vd, 2))
    dc_on_vertex = np.zeros((nv, vd))
    coe_on_vertex = np.zeros((nv, vd, 2), np.int32)
    eov_mask = np.zeros((nv, vd))
    for v in range(nv):
        if not mesh.interior_vertex[v]:
            continue
        for k in range(vd):
            e = mesh.edges_on_vertex[v, k]
            if e < 0:
                continue
            dx = _wrap(mesh.x_edge[e] - mesh.x_vertex[v], px)
            dy = _wrap(mesh.y_edge[e] - mesh.y_vertex[v], py)
            d = np.hypot(dx, dy)
            if d <= 0:
                continue
            nvt[v, k] = (dx / d, dy / d)
            dc_on_vertex[v, k] = mesh.dc_edge[e]
            c1, c2 = mesh.cells_on_edge[e]
            coe_on_vertex[v, k] = (max(c1, 0), max(c2, 0))
            eov_mask[v, k] = 1.0 if (c1 >= 0 and c2 >= 0) else 0.0

    return WeakTensors(
        normal_polygon=jnp.asarray(nvp, dtype),
        dv_on_cell=jnp.asarray(dv_on_cell, dtype),
        voe_on_cell=jnp.asarray(voe_on_cell, jnp.int32),
        edge_on_cell_mask=jnp.asarray(eoc_mask, dtype),
        normal_triangle=jnp.asarray(nvt, dtype),
        dc_on_vertex=jnp.asarray(dc_on_vertex, dtype),
        coe_on_vertex=jnp.asarray(coe_on_vertex, jnp.int32),
        edge_on_vertex_mask=jnp.asarray(eov_mask, dtype),
        tan_lat_cell=jnp.zeros((nc,), dtype),
        tan_lat_vertex=jnp.zeros((nv,), dtype),
    )


def strain_tensor_weak(wk: WeakTensors, mesh: MeshTensors,
                       u_vertex, v_vertex, area_cell, solve_stress):
    """Cell-mean strain via boundary line integral (reference
    seaice_strain_tensor_weak :112-250). Returns (e11, e22, e12),
    each [nCells]."""
    u_e = 0.5 * (u_vertex[wk.voe_on_cell[..., 0]] +
                 u_vertex[wk.voe_on_cell[..., 1]])   # [nCells, maxEdges]
    v_e = 0.5 * (v_vertex[wk.voe_on_cell[..., 0]] +
                 v_vertex[wk.voe_on_cell[..., 1]])
    w = wk.edge_on_cell_mask * wk.dv_on_cell
    nx = wk.normal_polygon[..., 0]
    ny = wk.normal_polygon[..., 1]
    e11 = (u_e * nx * w).sum(-1) / area_cell
    e22 = (v_e * ny * w).sum(-1) / area_cell
    e12 = (0.5 * (u_e * ny + v_e * nx) * w).sum(-1) / area_cell

    # spherical metric terms from cell-mean velocity (:233-242)
    voc_mask = mesh.vertices_on_cell_mask
    n = jnp.maximum(voc_mask.sum(-1), 1.0)
    u_c = (u_vertex[mesh.vertices_on_cell] * voc_mask).sum(-1) / n
    v_c = (v_vertex[mesh.vertices_on_cell] * voc_mask).sum(-1) / n
    tl = wk.tan_lat_cell
    e11 = e11 - v_c * tl
    e12 = e12 + 0.5 * u_c * tl

    ss = solve_stress > 0
    return (jnp.where(ss, e11, 0.0), jnp.where(ss, e22, 0.0),
            jnp.where(ss, e12, 0.0))


def stress_divergence_weak(wk: WeakTensors, mesh: MeshTensors,
                           s11, s22, s12, area_triangle, solve_velocity):
    """Divergence of cell stresses on the dual triangle (reference
    seaice_stress_divergence_weak :493-650). s** [nCells];
    returns (div_u, div_v) [nVertices]."""
    c1 = wk.coe_on_vertex[..., 0]
    c2 = wk.coe_on_vertex[..., 1]
    m = wk.edge_on_vertex_mask
    s11e = 0.5 * (s11[c1] + s11[c2])
    s22e = 0.5 * (s22[c1] + s22[c2])
    s12e = 0.5 * (s12[c1] + s12[c2])
    nx = wk.normal_triangle[..., 0]
    ny = wk.normal_triangle[..., 1]
    w = m * wk.dc_on_vertex
    div_u = ((s11e * nx + s12e * ny) * w).sum(-1) / area_triangle
    div_v = ((s22e * ny + s12e * nx) * w).sum(-1) / area_triangle

    # metric terms from vertex-mean stress (:620-640)
    cov = mesh.cells_on_vertex
    cm = mesh.cells_on_vertex_mask
    nvd = jnp.maximum(cm.sum(-1), 1.0)
    s11v = (s11[cov] * cm).sum(-1) / nvd
    s22v = (s22[cov] * cm).sum(-1) / nvd
    s12v = (s12[cov] * cm).sum(-1) / nvd
    tl = wk.tan_lat_vertex
    div_u = div_u - 2.0 * tl * s12v
    div_v = div_v + tl * (s11v - s22v)

    sv = solve_velocity > 0
    return jnp.where(sv, div_u, 0.0), jnp.where(sv, div_v, 0.0)
