"""MPAS NetCDF mesh reader.

Builds a `Mesh` from a standard MPAS mesh file (the format consumed by
the reference via the framework's bootstrapping; fields per the MPAS
mesh specification: nCells/nEdges/nVertices dimensions, 1-based
connectivity with 0 = invalid). Supports classic netCDF (scipy) and
netCDF-4/HDF5 (h5py).
"""

from __future__ import annotations

import numpy as np

from ..mesh.core import Mesh


def _open_netcdf(path: str):
    """Return (dims: dict, var: name -> np.ndarray loader)."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:3] == b"CDF":
        from scipy.io import netcdf_file
        nc = netcdf_file(path, "r", mmap=False)
        dims = {k: v for k, v in nc.dimensions.items()}

        def get(name, default=None):
            if name not in nc.variables:
                return default
            return np.array(nc.variables[name][:])

        return dims, get
    if magic[:4] == b"\x89HDF":
        import h5py
        h = h5py.File(path, "r")
        dims = {}
        for k in ("nCells", "nEdges", "nVertices", "maxEdges",
                  "vertexDegree"):
            if k in h:
                dims[k] = h[k].shape[0] if h[k].shape else int(h[k][()])
        # netCDF4 dimensions live as attributes of phantom datasets;
        # fall back to variable shapes below
        def get(name, default=None):
            if name not in h:
                return default
            return np.array(h[name])

        return dims, get
    raise ValueError(f"unrecognized netCDF magic in {path!r}")


def read_mpas_mesh(path: str) -> Mesh:
    """Read an MPAS mesh file into a finalized Mesh."""
    dims, get = _open_netcdf(path)

    x_cell = get("xCell")
    n_cells = len(x_cell)
    x_vertex = get("xVertex")
    n_vertices = len(x_vertex)
    dv_edge = get("dvEdge")
    n_edges = len(dv_edge)
    verts_on_cell = get("verticesOnCell").astype(np.int64)
    max_edges = verts_on_cell.shape[1]
    cells_on_vertex = get("cellsOnVertex").astype(np.int64)
    vertex_degree = cells_on_vertex.shape[1]

    def conn(name, shape=None):
        a = get(name)
        if a is None:
            return None
        return a.astype(np.int32) - 1    # 1-based, 0 = invalid -> -1

    on_sphere_attr = get("on_a_sphere")
    sphere_radius = get("sphere_radius")
    # attributes aren't variables in classic files; detect from coords
    z_cell = get("zCell", np.zeros(n_cells))
    on_sphere = bool(np.abs(z_cell).max() > 1.0) if z_cell is not None \
        else False
    radius = float(np.sqrt(
        get("xCell") ** 2 + get("yCell") ** 2 + z_cell ** 2).max()) \
        if on_sphere else 0.0
    del on_sphere_attr, sphere_radius

    n_edges_on_cell = get("nEdgesOnCell").astype(np.int32)
    # mask vertices_on_cell beyond nEdgesOnCell
    voc = conn("verticesOnCell")
    k = np.arange(max_edges)[None, :]
    voc = np.where(k < n_edges_on_cell[:, None], voc, -1)
    eoc = conn("edgesOnCell")
    eoc = np.where(k < n_edges_on_cell[:, None], eoc, -1)
    coc = conn("cellsOnCell")
    coc = np.where(k < n_edges_on_cell[:, None], coc, -1)

    mesh = Mesh(
        n_cells=n_cells, n_vertices=n_vertices, n_edges=n_edges,
        max_edges=max_edges, vertex_degree=vertex_degree,
        on_sphere=on_sphere, sphere_radius=radius,
        vertices_on_cell=voc,
        n_edges_on_cell=n_edges_on_cell,
        cells_on_vertex=conn("cellsOnVertex"),
        edges_on_cell=eoc,
        cells_on_cell=coc,
        cells_on_edge=conn("cellsOnEdge"),
        vertices_on_edge=conn("verticesOnEdge"),
        edges_on_vertex=conn("edgesOnVertex"),
        x_cell=get("xCell"), y_cell=get("yCell"),
        z_cell=get("zCell", np.zeros(n_cells)),
        x_vertex=get("xVertex"), y_vertex=get("yVertex"),
        z_vertex=get("zVertex", np.zeros(n_vertices)),
        x_edge=get("xEdge"), y_edge=get("yEdge"),
        lat_cell=get("latCell", np.zeros(n_cells)),
        lon_cell=get("lonCell", np.zeros(n_cells)),
        lat_vertex=get("latVertex", np.zeros(n_vertices)),
        lon_vertex=get("lonVertex", np.zeros(n_vertices)),
        area_cell=get("areaCell"),
        area_triangle=get("areaTriangle",
                          np.ones(n_vertices)),
        kite_areas_on_vertex=get("kiteAreasOnVertex",
                                 np.zeros((n_vertices, vertex_degree))),
        dv_edge=dv_edge, dc_edge=get("dcEdge"),
    )
    return mesh.finalize()


def write_mpas_mesh(path: str, mesh: Mesh) -> None:
    """Write a Mesh as a classic-NetCDF MPAS mesh file (the standard
    variable set read back by read_mpas_mesh; 1-based connectivity,
    0 = invalid per the MPAS specification)."""
    from scipy.io import netcdf_file
    nc = netcdf_file(path, "w")
    nc.createDimension("nCells", mesh.n_cells)
    nc.createDimension("nVertices", mesh.n_vertices)
    nc.createDimension("nEdges", mesh.n_edges)
    nc.createDimension("maxEdges", mesh.max_edges)
    nc.createDimension("vertexDegree", mesh.vertex_degree)
    nc.createDimension("TWO", 2)

    def putf(name, dims, data):
        v = nc.createVariable(name, "d", dims)
        v[:] = np.asarray(data, np.float64)

    def putc(name, dims, data):
        v = nc.createVariable(name, "i", dims)
        v[:] = np.asarray(data, np.int32) + 1      # 0-based -> 1-based

    putf("xCell", ("nCells",), mesh.x_cell)
    putf("yCell", ("nCells",), mesh.y_cell)
    putf("zCell", ("nCells",), mesh.z_cell
         if mesh.z_cell is not None else np.zeros(mesh.n_cells))
    putf("xVertex", ("nVertices",), mesh.x_vertex)
    putf("yVertex", ("nVertices",), mesh.y_vertex)
    putf("zVertex", ("nVertices",), mesh.z_vertex
         if mesh.z_vertex is not None else np.zeros(mesh.n_vertices))
    putf("latCell", ("nCells",), mesh.lat_cell
         if mesh.lat_cell is not None else np.zeros(mesh.n_cells))
    putf("lonCell", ("nCells",), mesh.lon_cell
         if mesh.lon_cell is not None else np.zeros(mesh.n_cells))
    putf("latVertex", ("nVertices",), mesh.lat_vertex
         if mesh.lat_vertex is not None else np.zeros(mesh.n_vertices))
    putf("lonVertex", ("nVertices",), mesh.lon_vertex
         if mesh.lon_vertex is not None else np.zeros(mesh.n_vertices))
    if mesh.x_edge is not None:
        putf("xEdge", ("nEdges",), mesh.x_edge)
        putf("yEdge", ("nEdges",), mesh.y_edge)
    putf("areaCell", ("nCells",), mesh.area_cell)
    putf("areaTriangle", ("nVertices",), mesh.area_triangle)
    if mesh.kite_areas_on_vertex is not None:
        putf("kiteAreasOnVertex", ("nVertices", "vertexDegree"),
             mesh.kite_areas_on_vertex)
    putf("dvEdge", ("nEdges",), mesh.dv_edge)
    putf("dcEdge", ("nEdges",), mesh.dc_edge)
    v = nc.createVariable("nEdgesOnCell", "i", ("nCells",))
    v[:] = np.asarray(mesh.n_edges_on_cell, np.int32)
    putc("verticesOnCell", ("nCells", "maxEdges"),
         mesh.vertices_on_cell)
    putc("edgesOnCell", ("nCells", "maxEdges"), mesh.edges_on_cell)
    putc("cellsOnCell", ("nCells", "maxEdges"), mesh.cells_on_cell)
    putc("cellsOnVertex", ("nVertices", "vertexDegree"),
         mesh.cells_on_vertex)
    putc("cellsOnEdge", ("nEdges", "TWO"), mesh.cells_on_edge)
    putc("verticesOnEdge", ("nEdges", "TWO"), mesh.vertices_on_edge)
    putc("edgesOnVertex", ("nVertices", "vertexDegree"),
         mesh.edges_on_vertex)
    nc.close()
