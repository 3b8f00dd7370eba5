from .mesh import make_mesh, mesh_shape_for  # noqa: F401
from . import sharding  # noqa: F401
