"""Static seam-copy schedule for the fully-fused panel EVP kernel.

The per-subcycle ghost refreshes of the panel-shift formulation
(`variational_panel._vertex_planes` seam strips and the
`divergence_finish` pu pad strips) are, on the icosahedral rhombic
panels, pure AFFINE STRIP COPIES: every (plane, panel, side) ghost
strip is one contiguous run sourced from a single row or column of one
other panel's plane, possibly reversed — and always TRANSPOSED
(adjacent rhombi meet with their lattice axes swapped), which is why
the XLA path gathers them.  Inside a Pallas kernel a gather is
unavailable, but a batch of strip transposes is one small matmul
against an identity (or anti-identity, for the reversed runs) on the
MXU: dot_general contracting dim 0 of a stacked column block is a
native transposed-operand matmul.

This module derives the static run schedule from the PanelLayout ghost
tables and verifies the affine structure (it is a property of the
icosahedral seam topology, asserted here rather than assumed).
`tests/test_panel_fused.py` checks the schedule reproduces the ghost
maps used by the XLA path bit-for-bit.

Plane coordinate conventions (see variational_panel.py): a vertex at
lattice (i, j) of panel p, plane t sits at plane coords (a=i, b=j+1);
a cell at (i, j) sits at (a=i+1, b=j).  Vertex ghost strips live on
the a=N row / b=0 column; pu (divergence) ghost strips on the a=0 row
/ b=N column.

Reference: the seam communication this replaces is the per-subcycle
vertex-velocity halo exchange of
`/root/reference/src/shared/mpas_seaice_velocity_solver.F:2546-2584`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class StripRun:
    """One affine seam copy: dst strip <- src strip (transposed).

    dst_kind 'row': dst positions (dst_fixed, dst_lo + k) for k < n
    (a fixed, b varies); 'col': (dst_lo + k, dst_fixed).  The source of
    step k is (src_a0 + k*src_da, src_b0 + k*src_db) in plane
    `src_plane` of panel `src_panel`.  Transposition means a 'row' dst
    has src_da = +-1 (src varies along a) and a 'col' dst has
    src_db = +-1.
    """
    dst_plane: int
    dst_panel: int
    dst_kind: str
    dst_fixed: int
    dst_lo: int
    n: int
    src_plane: int
    src_panel: int
    src_a0: int
    src_b0: int
    src_da: int
    src_db: int

    @property
    def reversed_src(self) -> bool:
        return (self.src_da < 0) or (self.src_db < 0)


def _runs_from_entries(entries, what: str) -> List[StripRun]:
    """Group (dst_plane, dst_panel, kind, fixed, var, src...) entries
    into affine runs; assert each group is a single transposed run."""
    groups = {}
    for e in entries:
        key = (e[0], e[1], e[2], e[3])
        groups.setdefault(key, []).append(e[4:])
    runs = []
    for (pl, pan, kind, fixed), items in sorted(groups.items()):
        items.sort()
        var0 = items[0][0]
        sp0, span0, sa0, sb0 = items[0][1:]
        n = len(items)
        if n == 1:
            da = db = 0
        else:
            da = items[1][3] - sa0
            db = items[1][4] - sb0
        for k, (var, sp, span, sa, sb) in enumerate(items):
            ok = (var == var0 + k and sp == sp0 and span == span0
                  and sa == sa0 + k * da and sb == sb0 + k * db)
            if not ok:
                raise AssertionError(
                    f"{what} ghost strip ({pl},{pan},{kind},{fixed}) is "
                    f"not a single affine run at step {k}")
        if n > 1 and not (abs(da) + abs(db) == 1):
            raise AssertionError(
                f"{what} ghost strip ({pl},{pan},{kind},{fixed}) has "
                f"non-unit source stride ({da},{db})")
        if n > 1:
            expect_transpose = (kind == "row" and db == 0) or \
                (kind == "col" and da == 0)
            if not expect_transpose:
                raise AssertionError(
                    f"{what} ghost strip ({pl},{pan},{kind},{fixed}) is "
                    "not transposed — the batched-transpose kernel "
                    "schedule does not apply to this mesh")
        runs.append(StripRun(pl, pan, kind, fixed, var0, n,
                             sp0, span0, sa0, sb0, da, db))
    return runs


def build_vertex_strip_runs(lay, N: int) -> List[StripRun]:
    """Seam copies refreshing the u/v vertex-plane ghost strips
    (a=N row, b=0 column) from owner interior positions.  Row runs are
    emitted after column runs so that replaying them in order gives
    row-wins-at-the-corner, matching `_vertex_planes`."""
    gvp = np.asarray(lay.ghost_vert_pos)
    gid = np.asarray(lay.ghost_vert_id)
    # src real vertex id -> (t', p', i', j') -> plane (a'=i', b'=j'+1)
    t_s = gid % 2
    q = gid // 2
    j_s = q % N
    q = q // N
    a_s = q % N
    p_s = q // N
    entries = []
    for k in range(len(gid)):
        p, vi, vj, t = (int(x) for x in gvp[k])
        a, b = vi, vj + 1
        if a == N:
            kind, fixed, var = "row", a, b
        elif b == 0:
            kind, fixed, var = "col", b, a
        else:
            raise AssertionError("vertex ghost off the pad strips")
        entries.append((t, p, kind, fixed, var,
                        int(t_s[k]), int(p_s[k]),
                        int(a_s[k]), int(j_s[k]) + 1))
    runs = _runs_from_entries(entries, "vertex")
    return ([r for r in runs if r.dst_kind == "col"] +
            [r for r in runs if r.dst_kind == "row"])


def build_pu_strip_runs(lay, N: int) -> List[StripRun]:
    """Seam copies refreshing the divergence-partial (pu/pv/mu/mv)
    ghost strips (a=0 row, b=N column) from owner interior cells.  The
    source slot may differ from the destination slot (the seam relabels
    corner patterns).  Row runs last => row wins at the (a=0, b=N)
    corner, matching `divergence_finish`."""
    gpp = np.asarray(lay.ghost_pu_pos)
    gps = np.asarray(lay.ghost_pu_src)
    n_interior = 10 * N * N
    entries = []
    for k in range(len(gpp)):
        slot, p, gi, gj = (int(x) for x in gpp[k])
        cid, sslot = int(gps[k, 0]), int(gps[k, 1])
        if cid >= n_interior:
            raise AssertionError(
                "pu ghost sourced from a pole cell — exception cells "
                "must not own seam ghosts")
        p_s = cid // (N * N)
        ij = cid % (N * N)
        i_s, j_s = ij // N, ij % N
        a, b = gi + 1, gj
        if a == 0:
            kind, fixed, var = "row", a, b
        elif b == N:
            kind, fixed, var = "col", b, a
        else:
            raise AssertionError("pu ghost off the pad strips")
        # src cell plane coords (a'=i'+1, b'=j')
        entries.append((slot, p, kind, fixed, var,
                        sslot, p_s, i_s + 1, j_s))
    runs = _runs_from_entries(entries, "pu")
    return ([r for r in runs if r.dst_kind == "col"] +
            [r for r in runs if r.dst_kind == "row"])


def apply_strip_runs(runs: List[StripRun], planes: np.ndarray,
                     N: int) -> np.ndarray:
    """NumPy oracle: replay the schedule on planes [nPlanes, 10,
    N+1, N+1] (in run order, so later runs win overlaps).  Used by the
    tests to check equivalence with the XLA gather maps."""
    out = np.array(planes)
    for r in runs:
        src = planes[r.src_plane, r.src_panel,
                     r.src_a0 + np.arange(r.n) * r.src_da,
                     r.src_b0 + np.arange(r.n) * r.src_db]
        if r.dst_kind == "row":
            out[r.dst_plane, r.dst_panel, r.dst_fixed,
                r.dst_lo:r.dst_lo + r.n] = src
        else:
            out[r.dst_plane, r.dst_panel,
                r.dst_lo:r.dst_lo + r.n, r.dst_fixed] = src
    return out
