"""Incremental-remapping tracer transport (reference
`mpas_seaice_advection_incremental_remap.F` + `..._tracers.F`)."""

from .tracers import (TracerSpec, TracerTree, standard_tracer_tree,
                      mass_only_tree, init_tracer_state)
from .geometry import (RemapGeometry, RemapTensors, build_remap_geometry,
                       N_TRI_SLOTS)
from .remap import (make_remap_step, global_conserved_sums,
                    departure_points, find_departure_triangles,
                    triangles_to_cell_coords, cfl_violations)
from .upwind import UpwindTensors, build_upwind_tensors, make_upwind_step
