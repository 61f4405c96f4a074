"""Mesh partitioning: owned + 2-deep-halo local blocks.

TPU-native replacement for the reference's Metis partition files +
MPAS block/halo machinery (`config_block_decomp_file_prefix`,
Registry.xml:337-384; exchange lists built by the external MPAS
framework). Cells are ordered along a Morton (Z-order) space-filling
curve for locality and split into contiguous equal chunks; each shard's
local block is its owned cells plus a 2-deep cell halo
(config_num_halos=2, Registry.xml:337-340), with all incident vertices
and edges.

Ownership rules (must be partition-invariant):
  cell   -> its chunk
  vertex -> owner of min(cellsOnVertex)
  edge   -> owner of min(cellsOnEdge)

Halo refresh maps are expressed against per-shard *export buffers*: each
shard exports the owned entities any other shard needs; a halo entity is
addressed as (source shard, index into that shard's export buffer). The
collective is then an all_gather of the small export buffers, not of the
full field — the analog of the reference's aggregated exchange groups
with reusable buffers (mpas_seaice_velocity_solver.F:258-386).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..mesh.core import Mesh


def morton_order(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order curve permutation of points (locality-preserving)."""
    n = len(x)
    bits = 16
    xi = np.clip(((x - x.min()) / max(np.ptp(x), 1e-300) *
                  ((1 << bits) - 1)), 0, (1 << bits) - 1).astype(np.uint64)
    yi = np.clip(((y - y.min()) / max(np.ptp(y), 1e-300) *
                  ((1 << bits) - 1)), 0, (1 << bits) - 1).astype(np.uint64)
    key = np.zeros(n, np.uint64)
    for b in range(bits):
        key |= ((xi >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
        key |= ((yi >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
    return np.argsort(key, kind="stable")


@dataclasses.dataclass
class LocalBlock:
    """One shard's local submesh and halo bookkeeping (host-side)."""
    mesh: Mesh                      # local mesh, padded to common sizes
    n_cells_owned: int              # same for all shards (padded)
    n_vertices_owned: int
    n_edges_owned: int
    cell_global: np.ndarray         # [nCellsLocal] -> global id, -1 pad
    vertex_global: np.ndarray
    edge_global: np.ndarray
    cell_owned_mask: np.ndarray     # [nCellsOwned] {0,1} (0 for padding)
    vertex_owned_mask: np.ndarray
    # export buffers: local owned indices this shard must publish
    cell_export_idx: np.ndarray     # [nCellExport] int32 (0-padded)
    vertex_export_idx: np.ndarray
    # halo receive maps: for each local halo entity (entities beyond the
    # owned range), (source shard, index into source's export buffer)
    cell_halo_src_shard: np.ndarray   # [nCellsLocal - nCellsOwned]
    cell_halo_src_idx: np.ndarray
    vertex_halo_src_shard: np.ndarray
    vertex_halo_src_idx: np.ndarray


@dataclasses.dataclass
class Partition:
    n_shards: int
    blocks: List[LocalBlock]
    # global ownership (for scatters/gathers at the host boundary)
    cell_owner: np.ndarray          # [nCellsGlobal] shard id
    vertex_owner: np.ndarray
    min_dv_edge: float              # global min edge length (revised EVP)

    def scatter_cell_field(self, field: np.ndarray) -> np.ndarray:
        """Global [nCells, ...] -> stacked local [S, nCellsLocal, ...]."""
        out = []
        for b in self.blocks:
            idx = np.maximum(b.cell_global, 0)
            loc = field[idx]
            loc[b.cell_global < 0] = 0
            out.append(loc)
        return np.stack(out)

    def scatter_vertex_field(self, field: np.ndarray) -> np.ndarray:
        out = []
        for b in self.blocks:
            idx = np.maximum(b.vertex_global, 0)
            loc = field[idx]
            loc[b.vertex_global < 0] = 0
            out.append(loc)
        return np.stack(out)

    def gather_cell_field(self, stacked: np.ndarray,
                          n_cells_global: int) -> np.ndarray:
        """Stacked local [S, nCellsLocal, ...] -> global [nCells, ...],
        taking each cell from its owner."""
        shape = (n_cells_global,) + stacked.shape[2:]
        out = np.zeros(shape, stacked.dtype)
        for s, b in enumerate(self.blocks):
            n = b.n_cells_owned
            gid = b.cell_global[:n]
            ok = gid >= 0
            out[gid[ok]] = stacked[s, :n][ok]
        return out

    def gather_vertex_field(self, stacked: np.ndarray,
                            n_vertices_global: int) -> np.ndarray:
        shape = (n_vertices_global,) + stacked.shape[2:]
        out = np.zeros(shape, stacked.dtype)
        for s, b in enumerate(self.blocks):
            n = b.n_vertices_owned
            gid = b.vertex_global[:n]
            ok = gid >= 0
            out[gid[ok]] = stacked[s, :n][ok]
        return out


def _pad_to(arr: np.ndarray, n: int, fill) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def partition_mesh(mesh: Mesh, n_shards: int, n_halo: int = 2) -> Partition:
    """Decompose `mesh` into n_shards local blocks."""
    nc = mesh.n_cells

    # 1. ownership
    order = morton_order(mesh.x_cell, mesh.y_cell)
    chunk = -(-nc // n_shards)
    cell_owner = np.empty(nc, np.int32)
    owned_cells = []
    for s in range(n_shards):
        ids = order[s * chunk:(s + 1) * chunk]
        cell_owner[ids] = s
        owned_cells.append(np.sort(ids))

    cov = mesh.cells_on_vertex
    cov_safe = np.where(cov >= 0, cov, nc)
    owner_pad = np.concatenate([cell_owner, [np.iinfo(np.int32).max]])
    vertex_owner = owner_pad[cov_safe].min(axis=1).astype(np.int32)
    coe = mesh.cells_on_edge
    coe_safe = np.where(coe >= 0, coe, nc)
    edge_owner = owner_pad[coe_safe].min(axis=1).astype(np.int32)

    # 2. local cell sets: owned + n_halo rings
    local_cells = []
    halo_of = []            # per shard: list of halo cell ids (ring order)
    coc = mesh.cells_on_cell
    for s in range(n_shards):
        inset = np.zeros(nc, bool)
        inset[owned_cells[s]] = True
        ring = owned_cells[s]
        halos = []
        for _ in range(n_halo):
            neigh = coc[ring].reshape(-1)
            neigh = neigh[neigh >= 0]
            new = np.unique(neigh[~inset[neigh]])
            inset[new] = True
            halos.append(new)
            ring = new
        local_cells.append(np.concatenate([owned_cells[s]] + halos))
        halo_of.append(np.concatenate(halos) if halos else
                       np.zeros(0, np.int64))

    # common padded sizes
    n_own_max = max(len(o) for o in owned_cells)
    n_halo_max = max(len(h) for h in halo_of)

    # 3. local vertex / edge sets, split owned-first
    local_vertices = []
    local_edges = []
    voc = mesh.vertices_on_cell
    eoc = mesh.edges_on_cell
    for s in range(n_shards):
        lc = local_cells[s]
        vs = np.unique(voc[lc].reshape(-1))
        vs = vs[vs >= 0]
        es = np.unique(eoc[lc].reshape(-1))
        es = es[es >= 0]
        v_own = vs[vertex_owner[vs] == s]
        v_halo = vs[vertex_owner[vs] != s]
        e_own = es[edge_owner[es] == s]
        e_halo = es[edge_owner[es] != s]
        local_vertices.append((v_own, v_halo))
        local_edges.append((e_own, e_halo))

    nv_own_max = max(len(v[0]) for v in local_vertices)
    nv_halo_max = max(len(v[1]) for v in local_vertices)
    ne_own_max = max(len(e[0]) for e in local_edges)
    ne_halo_max = max(len(e[1]) for e in local_edges)

    # 4. export lists: owned entities appearing in any other shard's halo
    cell_needed_by = [set() for _ in range(n_shards)]
    vertex_needed_by = [set() for _ in range(n_shards)]
    for s in range(n_shards):
        for g in halo_of[s]:
            cell_needed_by[cell_owner[g]].add(int(g))
        for g in local_vertices[s][1]:
            vertex_needed_by[vertex_owner[g]].add(int(g))
    cell_export = [np.array(sorted(cb), np.int64)
                   for cb in cell_needed_by]
    vertex_export = [np.array(sorted(vb), np.int64)
                     for vb in vertex_needed_by]
    nce_max = max(1, max(len(e) for e in cell_export))
    nve_max = max(1, max(len(e) for e in vertex_export))

    # global -> (export position) lookup per shard
    cell_export_pos = {}
    vertex_export_pos = {}
    for s in range(n_shards):
        for i, g in enumerate(cell_export[s]):
            cell_export_pos[g] = (s, i)
        for i, g in enumerate(vertex_export[s]):
            vertex_export_pos[g] = (s, i)

    # 5. assemble local blocks
    blocks = []
    for s in range(n_shards):
        oc = owned_cells[s]
        hc = halo_of[s]
        v_own, v_halo = local_vertices[s]
        e_own, e_halo = local_edges[s]

        cell_global = np.concatenate([
            _pad_to(oc, n_own_max, -1), _pad_to(hc, n_halo_max, -1)])
        vertex_global = np.concatenate([
            _pad_to(v_own, nv_own_max, -1), _pad_to(v_halo, nv_halo_max, -1)])
        edge_global = np.concatenate([
            _pad_to(e_own, ne_own_max, -1), _pad_to(e_halo, ne_halo_max, -1)])

        c_l = np.full(nc + 1, -1, np.int64)     # global -> local
        ok = cell_global >= 0
        c_l[cell_global[ok]] = np.nonzero(ok)[0]
        v_l = np.full(mesh.n_vertices + 1, -1, np.int64)
        okv = vertex_global >= 0
        v_l[vertex_global[okv]] = np.nonzero(okv)[0]
        e_l = np.full(mesh.n_edges + 1, -1, np.int64)
        oke = edge_global >= 0
        e_l[edge_global[oke]] = np.nonzero(oke)[0]

        def remap_c(a):
            return np.where(a >= 0, c_l[np.where(a >= 0, a, 0)],
                            -1).astype(np.int32)

        def remap_v(a):
            return np.where(a >= 0, v_l[np.where(a >= 0, a, 0)],
                            -1).astype(np.int32)

        def remap_e(a):
            return np.where(a >= 0, e_l[np.where(a >= 0, a, 0)],
                            -1).astype(np.int32)

        def take_c(a, fill=0.0):
            out = np.where((cell_global >= 0)[
                (slice(None),) + (None,) * (a.ndim - 1)],
                a[np.maximum(cell_global, 0)], fill)
            return out

        def take_v(a, fill=0.0):
            return np.where((vertex_global >= 0)[
                (slice(None),) + (None,) * (a.ndim - 1)],
                a[np.maximum(vertex_global, 0)], fill)

        def take_e(a, fill=0.0):
            return np.where((edge_global >= 0)[
                (slice(None),) + (None,) * (a.ndim - 1)],
                a[np.maximum(edge_global, 0)], fill)

        lmesh = Mesh(
            n_cells=len(cell_global),
            n_vertices=len(vertex_global),
            n_edges=len(edge_global),
            max_edges=mesh.max_edges,
            vertex_degree=mesh.vertex_degree,
            on_sphere=mesh.on_sphere,
            sphere_radius=mesh.sphere_radius,
            period_x=mesh.period_x, period_y=mesh.period_y,
            vertices_on_cell=remap_v(take_c(mesh.vertices_on_cell, -1)),
            n_edges_on_cell=take_c(mesh.n_edges_on_cell, 0
                                   ).astype(np.int32),
            cells_on_vertex=remap_c(take_v(mesh.cells_on_vertex, -1)),
            edges_on_cell=remap_e(take_c(mesh.edges_on_cell, -1)),
            cells_on_cell=remap_c(take_c(mesh.cells_on_cell, -1)),
            cells_on_edge=remap_c(take_e(mesh.cells_on_edge, -1)),
            vertices_on_edge=remap_v(take_e(mesh.vertices_on_edge, -1)),
            edges_on_vertex=remap_e(take_v(mesh.edges_on_vertex, -1)),
            x_cell=take_c(mesh.x_cell), y_cell=take_c(mesh.y_cell),
            z_cell=take_c(mesh.z_cell),
            x_vertex=take_v(mesh.x_vertex), y_vertex=take_v(mesh.y_vertex),
            z_vertex=take_v(mesh.z_vertex),
            x_edge=take_e(mesh.x_edge), y_edge=take_e(mesh.y_edge),
            lat_cell=take_c(mesh.lat_cell), lon_cell=take_c(mesh.lon_cell),
            lat_vertex=take_v(mesh.lat_vertex),
            lon_vertex=take_v(mesh.lon_vertex),
            area_cell=np.maximum(take_c(mesh.area_cell), 1.0),
            area_triangle=np.maximum(take_v(mesh.area_triangle), 1.0),
            kite_areas_on_vertex=take_v(mesh.kite_areas_on_vertex),
            dv_edge=take_e(mesh.dv_edge), dc_edge=take_e(mesh.dc_edge),
            f_vertex=take_v(mesh.f_vertex) if mesh.f_vertex is not None
            else None,
            f_cell=take_c(mesh.f_cell) if mesh.f_cell is not None else None,
        ).finalize()

        # halo receive maps
        ch_shard = np.zeros(n_halo_max, np.int32)
        ch_idx = np.zeros(n_halo_max, np.int32)
        for i, g in enumerate(hc):
            sh, ix = cell_export_pos[int(g)]
            ch_shard[i], ch_idx[i] = sh, ix
        vh_shard = np.zeros(nv_halo_max, np.int32)
        vh_idx = np.zeros(nv_halo_max, np.int32)
        for i, g in enumerate(v_halo):
            sh, ix = vertex_export_pos[int(g)]
            vh_shard[i], vh_idx[i] = sh, ix

        # export index lists (local owned indices)
        ce_idx = np.zeros(nce_max, np.int32)
        ce = cell_export[s]
        ce_idx[:len(ce)] = c_l[ce]
        ve_idx = np.zeros(nve_max, np.int32)
        ve = vertex_export[s]
        ve_idx[:len(ve)] = v_l[ve]

        blocks.append(LocalBlock(
            mesh=lmesh,
            n_cells_owned=n_own_max,
            n_vertices_owned=nv_own_max,
            n_edges_owned=ne_own_max,
            cell_global=cell_global, vertex_global=vertex_global,
            edge_global=edge_global,
            cell_owned_mask=(cell_global[:n_own_max] >= 0).astype(
                np.float64),
            vertex_owned_mask=(vertex_global[:nv_own_max] >= 0).astype(
                np.float64),
            cell_export_idx=ce_idx, vertex_export_idx=ve_idx,
            cell_halo_src_shard=ch_shard, cell_halo_src_idx=ch_idx,
            vertex_halo_src_shard=vh_shard, vertex_halo_src_idx=vh_idx,
        ))

    pos = mesh.dv_edge[mesh.dv_edge > 0]
    return Partition(
        n_shards=n_shards, blocks=blocks,
        cell_owner=cell_owner, vertex_owner=vertex_owner,
        min_dv_edge=float(pos.min()) if len(pos) else 0.0)
