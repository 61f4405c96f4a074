from .core import Mesh, MeshTensors  # noqa: F401
from .generate import planar_quad_mesh, planar_hex_mesh  # noqa: F401
