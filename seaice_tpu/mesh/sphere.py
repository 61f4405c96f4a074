"""Spherical mesh generation: icosahedral Voronoi (hex/pentagon) grids.

Quasi-uniform global meshes in the MPAS format — the stand-in for the
reference's QU meshes (e.g. QU120km, which the reference test harness
downloads; testing_and_setup/testing/README.rst): generating points
from an n-times-subdivided icosahedron, cells = spherical Voronoi
regions (12 pentagons + hexagons), mesh vertices = triangle
circumcenters, all projected to the sphere.
"""

from __future__ import annotations

import numpy as np

from .core import Mesh
from .. import constants as c


def _icosahedron():
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
        float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    return v, f


def _subdivide(verts, faces):
    """One 4-way triangle subdivision, points projected to the sphere."""
    edge_mid = {}
    verts = list(verts)

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            m = verts[a] + verts[b]
            m = m / np.linalg.norm(m)
            edge_mid[key] = len(verts)
            verts.append(m)
        return edge_mid[key]

    new_faces = []
    for a, b, cc in faces:
        ab = midpoint(a, b)
        bc = midpoint(b, cc)
        ca = midpoint(cc, a)
        new_faces += [[a, ab, ca], [b, bc, ab], [cc, ca, bc],
                      [ab, bc, ca]]
    return np.array(verts), np.array(new_faces, np.int64)


def _circumcenter(p1, p2, p3):
    """Spherical triangle circumcenter (normalized)."""
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # orient outward
    centroid = (p1 + p2 + p3) / 3.0
    sign = np.sign((n * centroid).sum(-1, keepdims=True))
    sign = np.where(sign == 0, 1.0, sign)
    return n * sign


def _spherical_polygon_area(points, radius):
    """Area of a spherical polygon given CCW corner unit vectors
    [n, 3] (l'Huilier / spherical excess via angle sum)."""
    n = len(points)
    angles = 0.0
    for i in range(n):
        a = points[(i - 1) % n]
        b = points[i]
        cc = points[(i + 1) % n]
        # tangent-plane vectors at b
        t1 = a - b * (a @ b)
        t2 = cc - b * (cc @ b)
        t1 /= np.linalg.norm(t1)
        t2 /= np.linalg.norm(t2)
        ang = np.arccos(np.clip(t1 @ t2, -1.0, 1.0))
        angles += ang
    return (angles - (n - 2) * np.pi) * radius ** 2


def icosahedral_mesh(subdivisions: int = 3,
                     radius: float = c.EARTH_RADIUS) -> Mesh:
    """Build the spherical Voronoi mesh from an n-subdivided icosahedron.

    subdivisions=3 -> 642 cells (~885 km); 4 -> 2562 (~440 km);
    5 -> 10242 (~220 km); 6 -> 40962 (~110 km, QU120km-class)."""
    pts, tris = _icosahedron()
    for _ in range(subdivisions):
        pts, tris = _subdivide(pts, tris)

    n_cells = len(pts)          # generators = cells
    n_vertices = len(tris)      # triangle circumcenters = vertices
    vert_xyz = _circumcenter(pts[tris[:, 0]], pts[tris[:, 1]],
                             pts[tris[:, 2]])

    # cells on vertex = the triangle's corners
    cells_on_vertex = tris.astype(np.int32)
    vertex_degree = 3

    # vertices (triangles) around each cell, CCW-ordered
    tri_of_cell = [[] for _ in range(n_cells)]
    for t, tri in enumerate(tris):
        for cc in tri:
            tri_of_cell[cc].append(t)
    max_edges = max(len(x) for x in tri_of_cell)

    # local tangent frame at each cell for ordering
    def tangent_frame(p):
        z = np.array([0.0, 0.0, 1.0])
        e1 = np.cross(z, p)
        if np.linalg.norm(e1) < 1e-12:
            e1 = np.cross(np.array([1.0, 0.0, 0.0]), p)
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(p, e1)
        return e1, e2

    vertices_on_cell = np.full((n_cells, max_edges), -1, np.int32)
    n_edges_on_cell = np.zeros(n_cells, np.int32)
    for cc in range(n_cells):
        ts = tri_of_cell[cc]
        e1, e2 = tangent_frame(pts[cc])
        ang = [np.arctan2((vert_xyz[t] @ e2), (vert_xyz[t] @ e1))
               for t in ts]
        order = np.argsort(ang)
        ts_sorted = [ts[i] for i in order]
        n_edges_on_cell[cc] = len(ts_sorted)
        vertices_on_cell[cc, :len(ts_sorted)] = ts_sorted

    # edges: between adjacent cells (shared triangle pair), identified by
    # consecutive vertices on each cell's ring
    edge_index = {}
    edge_cells = []
    edge_verts = []
    edges_on_cell = np.full((n_cells, max_edges), -1, np.int32)
    for cc in range(n_cells):
        ne = n_edges_on_cell[cc]
        for k in range(ne):
            v1 = vertices_on_cell[cc, k]
            v2 = vertices_on_cell[cc, (k + 1) % ne]
            key = (min(v1, v2), max(v1, v2))
            if key not in edge_index:
                edge_index[key] = len(edge_cells)
                edge_cells.append([cc, -1])
                edge_verts.append([v1, v2])
            else:
                e = edge_index[key]
                if edge_cells[e][0] != cc:
                    edge_cells[e][1] = cc
            edges_on_cell[cc, k] = edge_index[key]
    n_edges = len(edge_cells)
    cells_on_edge = np.array(edge_cells, np.int32)
    vertices_on_edge = np.array(edge_verts, np.int32)

    # cells_on_cell via shared edge
    cells_on_cell = np.full((n_cells, max_edges), -1, np.int32)
    for cc in range(n_cells):
        for k in range(n_edges_on_cell[cc]):
            e = edges_on_cell[cc, k]
            a, b = cells_on_edge[e]
            cells_on_cell[cc, k] = b if a == cc else a

    # edges_on_vertex
    edges_on_vertex = np.full((n_vertices, vertex_degree), -1, np.int32)
    fill = np.zeros(n_vertices, np.int32)
    for e in range(n_edges):
        for v in vertices_on_edge[e]:
            if fill[v] < vertex_degree:
                edges_on_vertex[v, fill[v]] = e
                fill[v] += 1

    # geometry
    cell_xyz = pts * radius
    vxyz = vert_xyz * radius
    edge_xyz = np.zeros((n_edges, 3))
    dv_edge = np.zeros(n_edges)
    dc_edge = np.zeros(n_edges)
    for e in range(n_edges):
        v1, v2 = vertices_on_edge[e]
        m = vert_xyz[v1] + vert_xyz[v2]
        m /= np.linalg.norm(m)
        edge_xyz[e] = m * radius
        dv_edge[e] = radius * np.arccos(np.clip(
            vert_xyz[v1] @ vert_xyz[v2], -1, 1))
        c1, c2 = cells_on_edge[e]
        if c2 >= 0:
            dc_edge[e] = radius * np.arccos(np.clip(
                pts[c1] @ pts[c2], -1, 1))

    area_cell = np.zeros(n_cells)
    for cc in range(n_cells):
        ring = vertices_on_cell[cc, :n_edges_on_cell[cc]]
        area_cell[cc] = _spherical_polygon_area(vert_xyz[ring], radius)

    # dual triangle areas + kites
    area_triangle = np.zeros(n_vertices)
    kite = np.zeros((n_vertices, vertex_degree))
    for v in range(n_vertices):
        corners = pts[cells_on_vertex[v]]
        area_triangle[v] = _spherical_polygon_area(corners, radius)
        kite[v, :] = area_triangle[v] / vertex_degree

    lat_cell = np.arcsin(np.clip(pts[:, 2], -1, 1))
    lon_cell = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2 * np.pi)
    lat_vertex = np.arcsin(np.clip(vert_xyz[:, 2], -1, 1))
    lon_vertex = np.mod(np.arctan2(vert_xyz[:, 1], vert_xyz[:, 0]),
                        2 * np.pi)

    mesh = Mesh(
        n_cells=n_cells, n_vertices=n_vertices, n_edges=n_edges,
        max_edges=max_edges, vertex_degree=vertex_degree,
        on_sphere=True, sphere_radius=radius,
        vertices_on_cell=vertices_on_cell,
        n_edges_on_cell=n_edges_on_cell,
        cells_on_vertex=cells_on_vertex,
        edges_on_cell=edges_on_cell,
        cells_on_cell=cells_on_cell,
        cells_on_edge=cells_on_edge,
        vertices_on_edge=vertices_on_edge,
        edges_on_vertex=edges_on_vertex,
        x_cell=cell_xyz[:, 0], y_cell=cell_xyz[:, 1],
        z_cell=cell_xyz[:, 2],
        x_vertex=vxyz[:, 0], y_vertex=vxyz[:, 1], z_vertex=vxyz[:, 2],
        x_edge=edge_xyz[:, 0], y_edge=edge_xyz[:, 1],
        lat_cell=lat_cell, lon_cell=lon_cell,
        lat_vertex=lat_vertex, lon_vertex=lon_vertex,
        area_cell=area_cell, area_triangle=area_triangle,
        kite_areas_on_vertex=kite,
        dv_edge=dv_edge, dc_edge=dc_edge,
        f_vertex=2.0 * c.OMEGA * np.sin(lat_vertex),
        f_cell=2.0 * c.OMEGA * np.sin(lat_cell),
    )
    return mesh.finalize()
