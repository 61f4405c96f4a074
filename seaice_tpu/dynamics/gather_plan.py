"""Build-time planner for the fused unstructured EVP solver.

The reference runs its elastic subcycle loop with indirect addressing
over arbitrary MPAS connectivity (`mpas_seaice_velocity_solver.F:
2447-2592`; strain / stress-divergence loops in
`mpas_seaice_velocity_solver_variational.F:575-670,1064-1184`).  On
TPU, per-index XLA gathers cost ~2.7 ns each and dominate the
unstructured subcycle.  `dynamics/pallas_unstructured.py` instead runs
the WHOLE loop in one Pallas kernel, with both mesh indirections
realized as exact lane shuffles (`take_along_axis`) against small
windows of 128-wide rows:

  * cells are ordered by reverse Cuthill-McKee over the cell adjacency
    graph and vertices by first touch, giving compact windows;
  * work is tiled in GROUPS — 4 cell-chunks per [32, 128] tile and
    8 vertex-rows per [64, 128] tile — because on-chip op overhead
    (~20 ns) dominates [8, 128]-sized ops: grouping amortizes it over
    8-64x more lanes at the cost of a somewhat wider window union;
  * per target, the plan stores WHICH window row (`ksel`) and WHICH
    lane within it (`rlane`); the kernel broadcasts each window row
    and selects by `ksel == k` — a gather with zero decode cost and
    exact (shuffle, not arithmetic) numerics;
  * the metric-term vertex factor tan(lat)/r is folded into the
    cell-side partials (identical per-pair products to
    `variational_fast.stress_divergence_T`, which multiplies the
    gathered metric partial by tan(lat) at the same vertex).

Everything here is static NumPy; the kernel traces against the
resulting `UnstructuredPlan` pytree.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import static_aux_pytree_dataclass

LANES = 128
# group sizes: bigger groups amortize Mosaic's per-op shuffle overhead
# (fewer window rows in total) at the cost of wider tiles per row;
# tunable for experiments via env
import os as _os
CG = int(_os.environ.get("SEAICE_UNSTRUCTURED_CG", "4"))
VG = int(_os.environ.get("SEAICE_UNSTRUCTURED_VG", "8"))


class PlanMeta:
    """Hashable static metadata (baked into the kernel build; travels
    as pytree aux_data so jit caches on it)."""

    def __init__(self, nc, nv, me, vd, nchunk, ngc, ngv, kmax, kvmax,
                 r_v, cg=None, vg=None):
        self.cg = CG if cg is None else cg
        self.vg = VG if vg is None else vg
        self.nc = nc
        self.nv = nv
        self.me = me
        self.vd = vd
        self.nchunk = nchunk
        self.ngc = ngc          # number of cell groups
        self.ngv = ngv          # number of vertex groups
        self.kmax = kmax
        self.kvmax = kvmax
        self.r_v = r_v

    def _key(self):
        return (self.nc, self.nv, self.me, self.vd, self.nchunk,
                self.ngc, self.ngv, self.kmax, self.kvmax, self.r_v,
                self.cg, self.vg)

    def __eq__(self, other):
        return isinstance(other, PlanMeta) and \
            self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return f"PlanMeta{self._key()}"


@static_aux_pytree_dataclass("meta")
class UnstructuredPlan:
    """Static tensors for the fused unstructured EVP kernel."""
    # orderings (device int32)
    cell_perm: Any        # [nc]  new -> old
    vertex_perm: Any      # [nv]  new -> old
    cell_inv: Any         # [nc]  old -> new
    vertex_inv: Any       # [nv]  old -> new
    # cell-side gather plan (u,v at cell corners), per 4-chunk group
    wrow: Any             # [NGC, KMAX] int32 vertex-plane rows
    kcount: Any           # [NGC] int32
    ksel: Any             # [NGC, 32, 128] int32 which k (-1 invalid)
    rlane: Any            # [NGC, 32, 128] int32 lane within row
    # vertex-side gather plan (partials at vertices), per 8-row group
    vprow: Any            # [NGV, KVMAX] int32 pair-plane rows
    vkcount: Any          # [NGV] int32
    vksel: Any            # [NGV, 64, 128] int32 (-1 invalid)
    vrlane: Any           # [NGV, 64, 128] int32
    # per-group basis tiles (f32/f64), sublane = 8*chunk_local + slot
    gx: Any               # [NGC, me, 32, 128] d(basis_b)/dx at g
    gy: Any               # [NGC, me, 32, 128]
    bu: Any               # [NGC, me, 32, 128] basis integrals u
    bv: Any               # [NGC, me, 32, 128]
    bm: Any               # [NGC, me, 32, 128] metric integrals
    tlc: Any              # [NGC, 32, 128] tan(lat)/r at corner g
    inv_den: Any          # [R_V, 128] 1/variational_denominator (0 pad)
    meta: Any = None


def _cell_rcm_order(mesh) -> np.ndarray:
    """Reverse Cuthill-McKee over the cell adjacency graph (via shared
    vertices); BFS fallback if scipy is unavailable."""
    nc = mesh.n_cells
    cov = np.asarray(mesh.cells_on_vertex)
    rows, cols = [], []
    for k in range(cov.shape[1]):
        for k2 in range(k + 1, cov.shape[1]):
            a, b = cov[:, k], cov[:, k2]
            ok = (a >= 0) & (b >= 0)
            rows.append(a[ok])
            cols.append(b[ok])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        A = csr_matrix((np.ones(len(rows)), (rows, cols)),
                       shape=(nc, nc))
        A = A + A.T
        return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                          np.int64)
    except Exception:
        from collections import deque
        adj = [[] for _ in range(nc)]
        for a, b in zip(rows, cols):
            adj[a].append(b)
            adj[b].append(a)
        order = []
        seen = np.zeros(nc, bool)
        for seed in range(nc):
            if seen[seed]:
                continue
            q = deque([seed])
            seen[seed] = True
            while q:
                cc = q.popleft()
                order.append(cc)
                for n in adj[cc]:
                    if not seen[n]:
                        seen[n] = True
                        q.append(n)
        return np.asarray(order, np.int64)


def _window_plan(targets: np.ndarray, n_rows_cap: int):
    """targets: [NGROUPS, S, 128] global source positions (-1 = no
    target).  Returns (wrow [N, KMAX], kcount [N], ksel [N,S,128],
    rlane [N,S,128]) mapping each target to (window row rank, lane)."""
    n = targets.shape[0]
    wrow_l, kmax = [], 1
    for s in range(n):
        t = targets[s]
        rows_s = np.unique(t[t >= 0] // LANES)
        if len(rows_s) == 0:
            rows_s = np.array([0], np.int64)
        wrow_l.append(rows_s)
        kmax = max(kmax, len(rows_s))
    wrow = np.zeros((n, kmax), np.int64)
    kcount = np.zeros(n, np.int64)
    ksel = np.full(targets.shape, -1, np.int64)
    rlane = np.zeros(targets.shape, np.int64)
    for s in range(n):
        rows_s = wrow_l[s]
        kcount[s] = len(rows_s)
        wrow[s, :len(rows_s)] = rows_s
        wrow[s, len(rows_s):] = rows_s[0]
        rank = np.full(n_rows_cap, -1, np.int64)
        rank[rows_s] = np.arange(len(rows_s))
        t = targets[s]
        ok = t >= 0
        ksel[s][ok] = rank[t[ok] // LANES]
        rlane[s][ok] = t[ok] % LANES
    return wrow, kcount, ksel, rlane


def build_unstructured_plan(mesh, basis, dtype=jnp.float32):
    """Compute the UnstructuredPlan for `mesh` + variational `basis`
    (the same object consumed by `variational_fast.build_fast_tensors`).
    """
    nc, nv, me = mesh.n_cells, mesh.n_vertices, mesh.max_edges
    vd = mesh.vertex_degree

    cell_perm = _cell_rcm_order(mesh)                  # new -> old
    voc = np.asarray(mesh.vertices_on_cell)
    neoc = np.asarray(mesh.n_edges_on_cell)
    valid = (np.arange(me)[None, :] < neoc[:, None]) & (voc >= 0)

    # first-touch vertex numbering along the new cell order
    voc_new = voc[cell_perm]
    valid_new = valid[cell_perm]
    vertex_inv = np.full(nv, -1, np.int64)             # old -> new
    cnt = 0
    for v in voc_new[valid_new]:
        if vertex_inv[v] < 0:
            vertex_inv[v] = cnt
            cnt += 1
    for v in range(nv):                                # stragglers
        if vertex_inv[v] < 0:
            vertex_inv[v] = cnt
            cnt += 1
    vertex_perm = np.empty(nv, np.int64)               # new -> old
    vertex_perm[vertex_inv] = np.arange(nv)
    cell_inv = np.empty(nc, np.int64)
    cell_inv[cell_perm] = np.arange(nc)

    # pad the chunk count to a multiple of CG and the vertex-row count
    # to a multiple of VG
    nchunk = -(-nc // LANES)
    nchunk = -(-nchunk // CG) * CG
    ncp = nchunk * LANES
    r_v = -(-nv // LANES)
    r_v = -(-r_v // VG) * VG
    nvp = r_v * LANES
    ngc = nchunk // CG
    ngv = r_v // VG

    # ---- cell-side plan: target (group, 8*chunk_local+b, lane)
    tgt_c = np.full((ncp, 8), -1, np.int64)
    tgt_c[:nc, :me][valid_new] = vertex_inv[voc_new[valid_new]]
    tgt_c = np.transpose(tgt_c.reshape(nchunk, LANES, 8), (0, 2, 1))
    tgt_c = tgt_c.reshape(ngc, CG * 8, LANES)
    wrow, kcount, ksel, rlane = _window_plan(tgt_c, r_v)

    # ---- vertex-side plan: target (group, 8*row_local+d, lane)
    # pair planes are [NCHUNK*8, 128]: row = chunk*8 + dual slot j,
    # lane = cell % 128 (all in the new cell order)
    cov = np.asarray(mesh.cells_on_vertex)
    cva = np.asarray(mesh.cell_vertices_at_vertex)
    okv = (cov >= 0) & (cva >= 0)
    tgt_v = np.full((nvp, 8), -1, np.int64)
    c_new = np.where(okv, cell_inv[np.where(okv, cov, 0)], -1)
    pair_pos = np.where(okv, (c_new // LANES) * (8 * LANES)
                        + np.where(okv, cva, 0) * LANES
                        + c_new % LANES, -1)
    tgt_v[vertex_inv, :vd] = pair_pos
    tgt_v = np.transpose(tgt_v.reshape(r_v, LANES, 8), (0, 2, 1))
    tgt_v = tgt_v.reshape(ngv, VG * 8, LANES)
    vprow, vkcount, vksel, vrlane = _window_plan(tgt_v, nchunk * 8)

    # ---- basis tiles: [nc, me(b/s), me(g/j)] -> [NGC, me, 32, 128]
    def tiles(x_cbg):
        x = np.zeros((ncp, me, 8), np.float64)
        x[:nc, :, :me] = np.asarray(x_cbg)[cell_perm]
        x = np.transpose(x.reshape(nchunk, LANES, me, 8), (0, 2, 3, 1))
        return jnp.asarray(
            np.transpose(x.reshape(ngc, CG, me, 8, LANES),
                         (0, 2, 1, 3, 4)).reshape(ngc, me, CG * 8,
                                                  LANES), dtype)

    gx = tiles(basis.basis_gradient_u)
    gy = tiles(basis.basis_gradient_v)
    bu = tiles(basis.basis_integrals_u)
    bv = tiles(basis.basis_integrals_v)
    bm = tiles(basis.basis_integrals_metric)

    # tan(lat)/r at corner g (static gather; also the fold factor for
    # the metric divergence partials — identical per-pair products)
    tl_vert = np.asarray(basis.tan_lat_vertex_over_radius)
    tlc_full = np.zeros((ncp, 8), np.float64)
    tlc_full[:nc, :me] = np.where(
        valid_new, tl_vert[np.where(valid_new, voc_new, 0)], 0.0)
    tlc_full = np.transpose(tlc_full.reshape(nchunk, LANES, 8),
                            (0, 2, 1))
    tlc = jnp.asarray(tlc_full.reshape(ngc, CG * 8, LANES), dtype)

    den = np.asarray(basis.variational_denominator)[vertex_perm]
    invd = np.zeros(nvp)
    invd[:nv] = np.where(den != 0.0,
                         1.0 / np.where(den == 0.0, 1.0, den), 0.0)

    meta = PlanMeta(nc, nv, me, vd, nchunk, ngc, ngv,
                    int(wrow.shape[1]), int(vprow.shape[1]), r_v)
    return UnstructuredPlan(
        cell_perm=jnp.asarray(cell_perm, jnp.int32),
        vertex_perm=jnp.asarray(vertex_perm, jnp.int32),
        cell_inv=jnp.asarray(cell_inv, jnp.int32),
        vertex_inv=jnp.asarray(vertex_inv, jnp.int32),
        wrow=jnp.asarray(wrow, jnp.int32),
        kcount=jnp.asarray(kcount, jnp.int32),
        ksel=jnp.asarray(ksel, jnp.int32),
        rlane=jnp.asarray(rlane, jnp.int32),
        vprow=jnp.asarray(vprow, jnp.int32),
        vkcount=jnp.asarray(vkcount, jnp.int32),
        vksel=jnp.asarray(vksel, jnp.int32),
        vrlane=jnp.asarray(vrlane, jnp.int32),
        gx=gx, gy=gy, bu=bu, bv=bv, bm=bm, tlc=tlc,
        inv_den=jnp.asarray(invd.reshape(r_v, LANES), dtype),
        meta=meta,
    )
