from .core import Mesh, MeshTensors  # noqa: F401
from .generate import planar_quad_mesh, planar_hex_mesh  # noqa: F401
from .sphere import (icosahedral_mesh, delaunay_dual_mesh,  # noqa: F401
                     spherical_voronoi_mesh)
from .rotation import (grid_rotation_forward, grid_rotation_reverse,  # noqa
                       latlon_vector_rotation_forward,
                       latlon_vector_rotation_reverse, east_north_basis)
